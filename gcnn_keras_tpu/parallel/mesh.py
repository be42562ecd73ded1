"""Device mesh + batch sharding utilities.

The reference has NO distributed path (SURVEY §2.12) — this module is new
design: a 1-D ``data`` mesh for batch parallelism (optionally 2-D
``data x model`` later), jraph-free GraphBatch stacking so each device
consumes a self-contained sub-batch, and NamedSharding placement so jit
emits all collectives over ICI.
"""
from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..batch import GraphBatch


def make_mesh(n_devices: Optional[int] = None, axis: str = "data",
              devices: Optional[Sequence] = None) -> Mesh:
    devs = list(devices) if devices is not None else jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def stack_batches(batches: List[GraphBatch]) -> GraphBatch:
    """Stack D same-shape GraphBatches along a new leading device axis.

    Static fields (n_graphs, max_nodes) must agree across batches.
    """
    first = batches[0]
    for b in batches[1:]:
        assert b.n_graphs == first.n_graphs and b.max_nodes == first.max_nodes, \
            "stacked batches must share static shape metadata"
    return jax.tree.map(lambda *xs: jax.numpy.stack(xs, axis=0), *batches)


def shard_stacked_batch(stacked: GraphBatch, mesh: Mesh,
                        axis: str = "data") -> GraphBatch:
    """Place a stacked batch so the leading device axis is sharded over the
    mesh — one sub-batch per device, zero resharding at dispatch.

    Multi-process: ``stacked`` carries only THIS host's sub-batches (leading
    axis = local device count); each host's slice is assembled into the
    global array without any cross-host data movement."""
    sharding = NamedSharding(mesh, P(axis))
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)), stacked)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), stacked)
