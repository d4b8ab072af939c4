"""Worker-environment plumbing: make the rwcf package importable in Ray
worker processes regardless of the driver's cwd/sys.path, by attaching a
PYTHONPATH runtime_env to every rwcf-launched operator."""

from __future__ import annotations

import os

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def remote_args() -> dict:
    parts = [p for p in os.environ.get("PYTHONPATH", "").split(os.pathsep) if p]
    if _REPO in parts:
        # Workers inherit the driver environment when the driver's PYTHONPATH
        # already covers the repo (set before ray.init, e.g. by bench.py /
        # tests) — no dedicated runtime_env workers needed, which avoids a
        # worker-process respawn per stage.
        return {}
    return {"runtime_env": {"env_vars":
                            {"PYTHONPATH": os.pathsep.join([_REPO] + parts)}}}


def export_pythonpath() -> None:
    """Call BEFORE ray.init (when we own the session) so every worker
    inherits a sys.path that can import rwcf."""
    parts = [p for p in os.environ.get("PYTHONPATH", "").split(os.pathsep) if p]
    if _REPO not in parts:
        os.environ["PYTHONPATH"] = os.pathsep.join([_REPO] + parts)
