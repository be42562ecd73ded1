"""Device helpers (parity: ``kgcnn/utils/devices.py:11`` set_devices_gpu —
the TPU analog selects platform / visible devices)."""
from __future__ import annotations

import os
from typing import List, Optional


def honor_platform_env():
    """Make ``JAX_PLATFORMS=cpu python training/train_*.py`` actually work.

    Environments whose sitecustomize imports jax at interpreter start (the
    tunneled-TPU image here) consume platform selection before user code
    runs, so the env var alone is silently ignored and CLI runs land on
    the TPU. Called at the top of every training driver / root script:
    re-applies the env var via ``jax.config`` (authoritative after
    import, backend initializes lazily)."""
    import jax
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])


def set_devices(platform: Optional[str] = None,
                visible_devices: Optional[List[int]] = None):
    """Select jax platform ('tpu'/'cpu') and optionally restrict visible
    device ids. Must run before the first jax computation."""
    import jax
    if platform:
        jax.config.update("jax_platforms", platform)
    if visible_devices is not None:
        os.environ["JAX_VISIBLE_DEVICES"] = ",".join(str(d) for d in visible_devices)


def device_info() -> dict:
    import jax
    devs = jax.devices()
    return {
        "backend": jax.default_backend(),
        "device_count": jax.device_count(),
        "local_device_count": jax.local_device_count(),
        "devices": [str(d) for d in devs],
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
    }
