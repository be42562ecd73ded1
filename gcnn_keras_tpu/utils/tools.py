"""Misc tools (parity: ``kgcnn/utils/tools.py:5`` git hash)."""
from __future__ import annotations

import subprocess


def get_git_hash(path: str = ".") -> str:
    try:
        return subprocess.check_output(
            ["git", "rev-parse", "HEAD"], cwd=path,
            stderr=subprocess.DEVNULL).decode().strip()
    except Exception:
        return "unknown"
