"""Distributed edge-partitioned aggregation == single-device reference."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gcnn_keras_tpu.parallel.mesh import make_mesh
from gcnn_keras_tpu.parallel.edge_partition import (
    partition_graph, aggregate_partitioned,
)


def test_partitioned_aggregate_matches_single_device():
    if jax.device_count() < 4:
        pytest.skip("needs >= 4 devices")
    rs = np.random.RandomState(0)
    n, e, f = 1000, 8000, 32
    feats = rs.randn(n, f).astype(np.float32)
    pos = rs.randn(n, 3).astype(np.float32)
    senders = rs.randint(0, n, size=e)
    receivers = rs.randint(0, n, size=e)

    # single-device reference
    expect = np.zeros((n, f), dtype=np.float32)
    np.add.at(expect, receivers, feats[senders])

    mesh = make_mesh(4)
    part = partition_graph(feats, senders, receivers, 4,
                           locality_sort=True, positions=pos)
    out = aggregate_partitioned(part, mesh)
    assert np.allclose(out, expect, atol=1e-3), np.abs(out - expect).max()


def test_partition_edge_balance():
    rs = np.random.RandomState(1)
    n, e = 512, 4096
    pos = rs.randn(n, 3).astype(np.float32)
    feats = rs.randn(n, 8).astype(np.float32)
    senders = rs.randint(0, n, size=e)
    receivers = rs.randint(0, n, size=e)
    part = partition_graph(feats, senders, receivers, 4, positions=pos)
    counts = part.edge_mask.sum(axis=1)
    assert counts.sum() == e
    assert counts.max() < e  # actually distributed
