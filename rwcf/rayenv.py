"""Worker-environment plumbing: make the rwcf package importable in Ray
worker processes regardless of the driver's cwd/sys.path, by attaching a
PYTHONPATH runtime_env to every rwcf-launched operator."""

from __future__ import annotations

import os

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def remote_args() -> dict:
    parts = [p for p in os.environ.get("PYTHONPATH", "").split(os.pathsep) if p]
    if _REPO not in parts:
        parts.insert(0, _REPO)
    return {"runtime_env": {"env_vars": {"PYTHONPATH": os.pathsep.join(parts)}}}
