"""Weights & Biases wrapper (parity: ``kgcnn/utils/wandb_wizard.py:6-50``):
no-op when wandb is unavailable or disabled."""
from __future__ import annotations

from typing import Any, Dict, Optional

try:
    import wandb as _wandb
    _HAS_WANDB = True
except ImportError:
    _wandb = None
    _HAS_WANDB = False

_active = False


def init_wandb(project: str, name: Optional[str] = None,
               config: Optional[Dict[str, Any]] = None, enabled: bool = True,
               **kwargs):
    global _active
    if not (_HAS_WANDB and enabled):
        _active = False
        return None
    run = _wandb.init(project=project, name=name, config=config, **kwargs)
    _active = True
    return run


def log_wandb(metrics: Dict[str, Any], step: Optional[int] = None):
    if _active and _wandb is not None:
        _wandb.log(metrics, step=step)


def finish_wandb():
    global _active
    if _active and _wandb is not None:
        _wandb.finish()
    _active = False
