"""Full-model execution on an edge-partitioned giant graph (VERDICT r1
item 4): depth-4 SchNet forward+BACKWARD on one ~100k-node graph sharded
over the 8-device CPU mesh with per-layer halo re-exchange must equal the
single-device oracle — energies AND forces — and the halo machinery must
hard-fallback (never clip) when the partition doesn't support it."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gcnn_keras_tpu.parallel.mesh import make_mesh
from gcnn_keras_tpu.parallel.partitioned_model import (
    SchNetSpec, energy_single_device, force_single_device, init_params,
    prepare_partitioned, run_partitioned, fit_halo)
from gcnn_keras_tpu.parallel.edge_partition import (
    partition_graph, encode_halo_senders, required_halo_size)


def _chain_system(n, k=6, seed=0, box_aspect=50.0):
    """Points in a long box (locality along x) + kNN edges — the shape of a
    real slab/polymer system where block partitions have small halos."""
    rs = np.random.RandomState(seed)
    pos = rs.rand(n, 3).astype(np.float32)
    pos[:, 0] *= box_aspect
    from gcnn_keras_tpu import native
    res = native.neighbor_list(pos, cutoff=0.35, max_neighbors=k)
    if res is None:
        raise RuntimeError("native neighbor_list unavailable")
    pairs, _ = res
    receivers, senders = pairs[:, 0], pairs[:, 1]
    z = rs.choice([1, 6, 8], size=n).astype(np.int32)
    return z, pos, senders.astype(np.int64), receivers.astype(np.int64)


def _knn_numpy(pos, k):
    d = np.linalg.norm(pos[:, None] - pos[None], axis=-1)
    np.fill_diagonal(d, np.inf)
    nn = np.argsort(d, axis=1)[:, :k]
    recv = np.repeat(np.arange(len(pos)), k)
    send = nn.reshape(-1)
    return send.astype(np.int64), recv.astype(np.int64)


@pytest.fixture(scope="module")
def mesh():
    if jax.device_count() < 2:
        pytest.skip("needs multiple devices")
    return make_mesh(min(8, jax.device_count()))


def test_partitioned_schnet_matches_single_device_small(mesh):
    """2k nodes: exact parity of energy AND forces, halo strategy."""
    n = 2048
    rs = np.random.RandomState(1)
    pos = rs.rand(n, 3).astype(np.float32)
    pos[:, 0] *= 30.0
    send, recv = _knn_numpy(pos, 6)
    z = rs.choice([1, 6, 8], size=n).astype(np.int32)

    spec = SchNetSpec(depth=4, units=32, bins=16)
    params = init_params(spec, jax.random.PRNGKey(0))

    e_ref, f_ref = force_single_device(params, spec, jnp.asarray(z),
                                       jnp.asarray(pos), jnp.asarray(send),
                                       jnp.asarray(recv))

    pin = prepare_partitioned(z, pos, send, recv, mesh.shape["data"])
    assert pin.halo_size > 0, "locality-sorted chain should support halo"
    e_part, f_part = run_partitioned(params, spec, pin, mesh)

    np.testing.assert_allclose(e_part, float(e_ref), rtol=2e-5)
    np.testing.assert_allclose(f_part, np.asarray(f_ref), rtol=1e-4,
                               atol=2e-5)


def test_partitioned_schnet_100k_nodes(mesh):
    """~100k nodes, ~600k edges, depth 4, energy+forces == single device.
    Also records the achieved halo fraction (remote-sender share)."""
    n = 100_000
    try:
        z, pos, send, recv = _chain_system(n, k=6, seed=3)
    except Exception as exc:  # native neighborlist unavailable
        pytest.skip(f"native neighborlist unavailable: {exc}")

    spec = SchNetSpec(depth=4, units=32, bins=16)
    params = init_params(spec, jax.random.PRNGKey(1))

    pin = prepare_partitioned(z, pos, send, recv, mesh.shape["data"])
    e_part, f_part = run_partitioned(params, spec, pin, mesh)

    e_ref, f_ref = force_single_device(
        params, spec, jnp.asarray(z), jnp.asarray(pos),
        jnp.asarray(send), jnp.asarray(recv))

    assert pin.halo_size > 0
    # locality sort keeps the halo small: <5% of edges cross shards here
    assert pin.remote_fraction < 0.05, pin.remote_fraction
    np.testing.assert_allclose(e_part / n, float(e_ref) / n, rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(f_part, np.asarray(f_ref), rtol=1e-3,
                               atol=5e-5)


def test_halo_fallback_never_clips(mesh):
    """A partition with no locality (random permutation, long-range edges)
    must refuse the halo strategy and fall back to all-gather — and still
    be exactly correct."""
    n = 512
    rs = np.random.RandomState(7)
    pos = rs.rand(n, 3).astype(np.float32)
    # random long-range edges: senders uniformly anywhere
    recv = np.repeat(np.arange(n), 4).astype(np.int64)
    send = rs.randint(0, n, size=len(recv)).astype(np.int64)
    keep = send != recv
    send, recv = send[keep], recv[keep]
    z = rs.choice([1, 6, 8], size=n).astype(np.int32)

    # no locality sort: halo must be impossible/unprofitable
    pin = prepare_partitioned(z, pos, send, recv, mesh.shape["data"],
                              locality_sort=False)
    assert pin.halo_size == 0  # hard fallback to all-gather

    spec = SchNetSpec(depth=2, units=16, bins=8)
    params = init_params(spec, jax.random.PRNGKey(2))
    e_part, f_part = run_partitioned(params, spec, pin, mesh)
    e_ref, f_ref = force_single_device(
        params, spec, jnp.asarray(z), jnp.asarray(pos),
        jnp.asarray(send), jnp.asarray(recv))
    np.testing.assert_allclose(e_part, float(e_ref), rtol=2e-5)
    np.testing.assert_allclose(f_part, np.asarray(f_ref), rtol=1e-4,
                               atol=2e-5)


def test_encode_halo_strict_raises(mesh):
    n = 256
    rs = np.random.RandomState(9)
    pos = rs.rand(n, 3).astype(np.float32)
    recv = np.repeat(np.arange(n), 3).astype(np.int64)
    send = rs.randint(0, n, size=len(recv)).astype(np.int64)
    part = partition_graph(pos, send, recv, 8, locality_sort=False)
    need = required_halo_size(part)  # -1 = beyond ring neighbors
    if 0 <= need <= 1:
        pytest.skip("random graph unexpectedly local")
    with pytest.raises(ValueError):
        encode_halo_senders(part, 1, 8, strict=True)
