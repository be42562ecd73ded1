"""Multi-host (multi-process) scaffolding: ``jax.distributed`` runtime init
and per-host data sharding.

New capability vs the reference (single-process only, SURVEY §2.12). Within a
host, parallelism is the ``shard_map`` DP/edge-partition path; across hosts,
``jax.distributed.initialize`` joins processes into one global device mesh
(collectives ride ICI within a slice and DCN across slices — XLA picks the
transport, no NCCL/MPI dependency).

Single-process environments (CI, this repo's tests) are first-class: every
helper degrades to a no-op / identity so the same driver code runs anywhere.
"""
from __future__ import annotations

import logging
import os
from typing import Optional, Sequence

import numpy as np

logger = logging.getLogger(__name__)

_initialized = False


def maybe_initialize_distributed(coordinator_address: Optional[str] = None,
                                 num_processes: Optional[int] = None,
                                 process_id: Optional[int] = None) -> bool:
    """Initialize the JAX distributed runtime when multi-process coordinates
    are available; no-op otherwise.

    Sources, in priority order: explicit args, then the standard env vars
    (``JAX_COORDINATOR_ADDRESS``/``JAX_NUM_PROCESSES``/``JAX_PROCESS_ID``,
    or an existing cluster autodetect — SLURM/TPU pod env — which
    ``jax.distributed.initialize()`` handles natively with no args).

    Returns True if a multi-process runtime is (now) active.
    """
    global _initialized
    import jax

    # NOTE: must not touch jax.process_count()/devices() here — any backend
    # query counts as "a JAX computation" and forbids a later initialize().
    if _initialized:
        return True
    try:
        from jax._src import distributed as _dist
        if _dist.global_state.client is not None:
            _initialized = True
            return True
    except Exception:
        pass

    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    env_np = os.environ.get("JAX_NUM_PROCESSES")
    env_pid = os.environ.get("JAX_PROCESS_ID")
    if num_processes is None and env_np is not None:
        num_processes = int(env_np)
    if process_id is None and env_pid is not None:
        process_id = int(env_pid)

    if coordinator_address is None and num_processes is None:
        # nothing configured — single-process run
        return False

    import jax.distributed
    # CPU multi-process (tests / CI) needs an explicit cross-process
    # collectives implementation; harmless no-op for TPU slices.
    try:
        platforms = jax.config.jax_platforms or ""
        if "cpu" in platforms.split(","):
            jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:  # config name may change across jax versions
        pass
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    _initialized = True
    logger.info("jax.distributed initialized: process %d/%d, %d local / %d "
                "global devices", jax.process_index(), jax.process_count(),
                jax.local_device_count(), jax.device_count())
    return True


def host_shard_indices(num_samples: int,
                       process_index: Optional[int] = None,
                       process_count: Optional[int] = None,
                       seed: int = 0,
                       drop_remainder: bool = True) -> np.ndarray:
    """Per-host data sharding: the (shuffled) sample indices THIS host should
    load. Every host must call with the same ``num_samples``/``seed`` so the
    shards partition the dataset deterministically.

    With ``drop_remainder`` the shards are equal-sized (required so every
    host contributes the same number of steps per epoch — collective ops
    deadlock on unequal step counts).
    """
    import jax
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    order = np.random.RandomState(seed).permutation(num_samples)
    if drop_remainder:
        per_host = num_samples // pc
        return order[pi * per_host:(pi + 1) * per_host]
    return order[pi::pc]


def local_batch_iterator(graphs: Sequence, batch_size: int, mesh,
                         axis: str = "data", seed: int = 0,
                         global_keys: Sequence[str] = (), **batch_kwargs):
    """Per-host loader for the DP path: shards ``graphs`` over hosts
    (``host_shard_indices``), then yields device-stacked super-batches for
    this host's local mesh devices via ``dp_batch_iterator``."""
    from ..data.loader import GraphBatchLoader
    from .data_parallel import dp_batch_iterator

    idx = host_shard_indices(len(graphs), seed=seed)
    local = [graphs[i] for i in idx]
    loader = GraphBatchLoader(local, batch_size, shuffle=True, seed=seed,
                              global_keys=tuple(global_keys), **batch_kwargs)
    return dp_batch_iterator(loader, mesh, axis)
