"""ppermute halo-exchange aggregation == all-gather == single device."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gcnn_keras_tpu.parallel.mesh import make_mesh
from gcnn_keras_tpu.parallel.edge_partition import (
    partition_graph, aggregate_partitioned, encode_halo_senders,
    make_halo_aggregate,
)
from jax.sharding import NamedSharding, PartitionSpec as P


def test_halo_aggregate_matches_reference():
    if jax.device_count() < 4:
        pytest.skip("needs >= 4 devices")
    rs = np.random.RandomState(0)
    n, f = 1024, 32
    # spatially local graph: neighbors within a window of the locality order
    pos = np.stack([np.linspace(0, 100, n), rs.randn(n), rs.randn(n)], axis=1
                   ).astype(np.float32)
    feats = rs.randn(n, f).astype(np.float32)
    senders, receivers = [], []
    for i in range(n):
        for _ in range(6):
            j = np.clip(i + rs.randint(-40, 41), 0, n - 1)
            if j != i:
                senders.append(j)
                receivers.append(i)
    senders = np.array(senders)
    receivers = np.array(receivers)

    expect = np.zeros((n, f), dtype=np.float32)
    np.add.at(expect, receivers, feats[senders])

    n_dev = 4
    mesh = make_mesh(n_dev)
    part = partition_graph(feats, senders, receivers, n_dev,
                           locality_sort=True, positions=pos)
    halo = 64  # window 40 < 64
    sg_halo, ok = encode_halo_senders(part, halo, n_dev)
    assert ok, "halo too small for this graph"

    fn = make_halo_aggregate(mesh, halo)
    sharding = NamedSharding(mesh, P("data"))
    args = [jax.device_put(jnp.asarray(a), sharding) for a in
            (part.node_feats, sg_halo, part.receivers_local, part.edge_mask)]
    out = np.asarray(fn(*args)).reshape(-1, f)
    result = np.zeros((n, f), dtype=np.float32)
    result[part.order] = out[:n]
    assert np.allclose(result, expect, atol=1e-3), np.abs(result - expect).max()

    # cross-check with the all-gather variant
    out_ag = aggregate_partitioned(part, mesh)
    assert np.allclose(result, out_ag, atol=1e-3)


def test_halo_detects_out_of_range():
    rs = np.random.RandomState(1)
    n, f = 256, 8
    feats = rs.randn(n, f).astype(np.float32)
    senders = rs.randint(0, n, size=1000)   # global random: no locality
    receivers = rs.randint(0, n, size=1000)
    part = partition_graph(feats, senders, receivers, 4, locality_sort=False)
    _, ok = encode_halo_senders(part, 8, 4)
    assert not ok  # must flag that all_gather is required
