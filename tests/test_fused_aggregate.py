"""Fused gather-mul-segsum Pallas kernel (ops/pallas/fused_aggregate.py):
interpret-mode correctness vs numpy on GraphBatch-shaped graphs, first-order
gradients and grad-of-grad (force-training structure) vs the unfused chain,
in both precision modes."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gcnn_keras_tpu.ops.pallas.fused_aggregate import (
    _fused_gather_mul_segsum, fused_gather_mul_segsum)


@pytest.fixture(scope="module")
def graph():
    """Receiver-sorted edges, graph-contiguous nodes (batching invariant)."""
    rs = np.random.RandomState(0)
    n_graphs, max_nodes = 40, 24
    sizes = rs.randint(5, max_nodes + 1, n_graphs)
    starts = np.concatenate([[0], np.cumsum(sizes)])[:-1]
    n = int(sizes.sum())
    send, recv = [], []
    for s0, sz in zip(starts, sizes):
        for r in range(s0, s0 + sz):
            nbrs = rs.choice(np.arange(s0, s0 + sz), size=min(6, sz - 1),
                             replace=False)
            for j in nbrs:
                if j != r:
                    send.append(j)
                    recv.append(r)
    send, recv = np.array(send), np.array(recv)
    o = np.argsort(recv, kind="stable")
    send, recv = send[o], recv[o]
    f = 64
    x = rs.randn(n, f).astype(np.float32)
    filt = rs.randn(len(send), f).astype(np.float32)
    return n, max_nodes, x, filt, send, recv


@pytest.mark.parametrize("exact", [False, True])
def test_forward_matches_numpy(graph, exact):
    n, max_nodes, x, filt, send, recv = graph
    ref = np.zeros_like(x)
    np.add.at(ref, recv, x[send] * filt)
    out = _fused_gather_mul_segsum(
        jnp.asarray(x), jnp.asarray(filt), jnp.asarray(send),
        jnp.asarray(recv), n, max_nodes, interpret=True, exact=exact)
    atol = 5e-6 if exact else 2e-4  # split2: ~1e-5 relative
    np.testing.assert_allclose(np.asarray(out), ref, atol=atol)


def test_gradients_match_unfused(graph):
    n, max_nodes, x, filt, send, recv = graph
    sendj, recvj = jnp.asarray(send), jnp.asarray(recv)

    def loss_fused(x, filt):
        out = fused_gather_mul_segsum(x, filt, sendj, recvj, n, max_nodes,
                                      interpret=True, exact=True)
        return jnp.sum(out ** 2)

    def loss_ref(x, filt):
        xj = jnp.take(x, sendj, axis=0)
        return jnp.sum(jax.ops.segment_sum(xj * filt, recvj, n) ** 2)

    xs, fs = jnp.asarray(x), jnp.asarray(filt)
    g1 = jax.grad(loss_fused, argnums=(0, 1))(xs, fs)
    g2 = jax.grad(loss_ref, argnums=(0, 1))(xs, fs)
    np.testing.assert_allclose(np.asarray(g1[0]), np.asarray(g2[0]),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(g1[1]), np.asarray(g2[1]),
                               atol=2e-5)

    # grad-of-grad: the force-training structure (reverse over reverse)
    gg1 = jax.grad(lambda f_: jnp.sum(jax.grad(loss_fused)(xs, f_) ** 2))(fs)
    gg2 = jax.grad(lambda f_: jnp.sum(jax.grad(loss_ref)(xs, f_) ** 2))(fs)
    scale = np.abs(np.asarray(gg2)).max()
    np.testing.assert_allclose(np.asarray(gg1), np.asarray(gg2),
                               atol=3e-5 * max(scale, 1.0))


def test_dispatcher_falls_back_off_tpu(graph):
    from gcnn_keras_tpu.ops.pallas.fused_aggregate import gather_mul_segsum_auto
    n, max_nodes, x, filt, send, recv = graph
    out = gather_mul_segsum_auto(
        jnp.asarray(x), jnp.asarray(filt), jnp.asarray(send),
        jnp.asarray(recv), n, max_nodes, indices_are_sorted=True)
    ref = np.zeros_like(x)
    np.add.at(ref, recv, x[send] * filt)
    np.testing.assert_allclose(np.asarray(out), ref, atol=5e-6)
