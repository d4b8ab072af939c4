import pytest


@pytest.fixture(scope="session")
def ray_session():
    """One Ray session for the whole pytest run (driver may also pre-init)."""
    import ray

    from rwcf import rayenv
    rayenv.export_pythonpath()
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
        owns = True
    else:
        owns = False
    yield
    if owns:
        ray.shutdown()
