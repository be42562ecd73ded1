"""Checkpoint / resume via orbax (improves on the reference, which only
saves keras SavedModels without optimizer state — SURVEY §5)."""
from __future__ import annotations

import os
from typing import Any, Optional

import jax


def save_checkpoint(directory: str, params: Any, opt_state: Any = None,
                    step: int = 0, **extra) -> str:
    """Save params (+ optimizer state + metadata) to ``directory``."""
    import orbax.checkpoint as ocp
    path = os.path.abspath(os.path.join(directory, f"step_{step}"))
    payload = {"params": params}
    if opt_state is not None:
        payload["opt_state"] = opt_state
    if extra:
        payload["extra"] = extra
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()
    return path


def load_checkpoint(directory: str, step: Optional[int] = None,
                    target: Any = None) -> dict:
    """Load the checkpoint at ``step`` (or the latest)."""
    import orbax.checkpoint as ocp
    base = os.path.abspath(directory)
    if step is None:
        steps = [int(d.split("_")[1]) for d in os.listdir(base)
                 if d.startswith("step_")]
        if not steps:
            raise FileNotFoundError(f"no checkpoints under {base}")
        step = max(steps)
    path = os.path.join(base, f"step_{step}")
    ckptr = ocp.StandardCheckpointer()
    try:
        return ckptr.restore(path, target)
    except ValueError:
        # Cross-platform restore: a checkpoint written on the TPU records
        # device shardings that don't exist on a CPU host (and vice
        # versa). Re-read every leaf as a plain numpy array instead —
        # checkpoints must be portable across platforms (load_model.py /
        # evaluate_models.py run wherever the user is).
        with ocp.PyTreeCheckpointer() as tree_ckptr:
            meta = tree_ckptr.metadata(path).item_metadata
            import numpy as np
            restore_args = jax.tree.map(
                lambda _: ocp.RestoreArgs(restore_type=np.ndarray), meta.tree)
            return tree_ckptr.restore(
                path, args=ocp.args.PyTreeRestore(restore_args=restore_args))
