"""AD-closed bilinear primitives (ops/pallas/bilinear.py).

The gms/sddmm family must match the plain XLA chain for the value and for
every AD pattern force training exercises: first-order grads, the
grad-of-grad training pattern (loss on grad_r E differentiated wrt params),
and jvp-over-grad (the fast_force_step re-association).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gcnn_keras_tpu.ops.pallas.bilinear import bilinear_gather_mul_segsum


def _random_graph(rs, n_graphs=5, max_nodes=7, f=4):
    """Receiver-sorted disjoint batch with a dead padding node at the end."""
    sizes = rs.randint(2, max_nodes + 1, n_graphs)
    offs = np.concatenate([[0], np.cumsum(sizes)])
    n = int(offs[-1]) + 1  # +1 dead padding node
    send, recv = [], []
    for g in range(n_graphs):
        for i in range(sizes[g]):
            for j in range(sizes[g]):
                if i != j and rs.rand() < 0.7:
                    send.append(offs[g] + j)
                    recv.append(offs[g] + i)
    # padding edges at the dead last node
    for _ in range(3):
        send.append(n - 1)
        recv.append(n - 1)
    send = np.asarray(send, np.int32)
    recv = np.asarray(recv, np.int32)
    order = np.argsort(recv, kind="stable")
    send, recv = send[order], recv[order]
    perm = np.argsort(send, kind="stable").astype(np.int32)
    return n, send, recv, perm, int(max_nodes), f


@pytest.fixture(scope="module")
def graph():
    return _random_graph(np.random.RandomState(0))


def _chain(x, m, send, recv, n):
    return jax.ops.segment_sum(jnp.take(x, send, axis=0) * m, recv, n,
                               indices_are_sorted=True)


def test_value_and_first_order(graph):
    n, send, recv, perm, max_nodes, f = graph
    rs = np.random.RandomState(1)
    x = jnp.asarray(rs.randn(n, f), jnp.float32)
    m = jnp.asarray(rs.randn(len(send), f), jnp.float32)

    fam = bilinear_gather_mul_segsum(x, m, send, recv, perm, max_nodes)
    ref = _chain(x, m, send, recv, n)
    np.testing.assert_allclose(fam, ref, rtol=1e-6, atol=1e-6)

    def loss_fam(x, m):
        return jnp.sum(jnp.tanh(
            bilinear_gather_mul_segsum(x, m, send, recv, perm, max_nodes)))

    def loss_ref(x, m):
        return jnp.sum(jnp.tanh(_chain(x, m, send, recv, n)))

    gx_f, gm_f = jax.grad(loss_fam, argnums=(0, 1))(x, m)
    gx_r, gm_r = jax.grad(loss_ref, argnums=(0, 1))(x, m)
    np.testing.assert_allclose(gx_f, gx_r, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(gm_f, gm_r, rtol=1e-5, atol=1e-6)


def _force_training_setup(graph, use_family):
    """Two-layer 'energy' using the bilinear op, force = grad_r E,
    loss = E-term + force-term — the exact training AD structure."""
    n, send, recv, perm, max_nodes, f = graph
    rs = np.random.RandomState(3)
    x0 = jnp.asarray(rs.randn(n, f), jnp.float32)

    if use_family:
        def B(x, m):
            return bilinear_gather_mul_segsum(x, m, send, recv, perm,
                                              max_nodes)
    else:
        def B(x, m):
            return _chain(x, m, send, recv, n)

    def energy(theta, r):
        m = jnp.tanh(r @ theta)            # edge filter depends on r, theta
        x = x0 @ theta                      # node features depend on theta
        y = jnp.tanh(B(x, m))
        y = B(y, m * 2.0)
        return jnp.sum(y ** 2)

    def loss(theta, r):
        force = jax.grad(energy, argnums=1)(theta, r)
        return energy(theta, r) + jnp.sum(jnp.sin(force) ** 2)

    theta = jnp.asarray(rs.randn(f, f), jnp.float32)
    r = jnp.asarray(rs.randn(len(send), f), jnp.float32)
    return energy, loss, theta, r


def test_grad_of_grad_training_pattern(graph):
    _, loss_f, theta, r = _force_training_setup(graph, use_family=True)
    _, loss_r, _, _ = _force_training_setup(graph, use_family=False)
    for argnums in (0, 1):
        gf = jax.jit(jax.grad(loss_f, argnums=argnums))(theta, r)
        gr = jax.jit(jax.grad(loss_r, argnums=argnums))(theta, r)
        np.testing.assert_allclose(gf, gr, rtol=2e-4, atol=1e-5)


def test_jvp_over_grad(graph):
    ef, _, theta, r = _force_training_setup(graph, use_family=True)
    er, _, _, _ = _force_training_setup(graph, use_family=False)
    v = jnp.ones_like(theta)

    def force_f(th):
        return jax.grad(ef, argnums=1)(th, r)

    def force_r(th):
        return jax.grad(er, argnums=1)(th, r)

    _, tf_ = jax.jvp(force_f, (theta,), (v,))
    _, tr_ = jax.jvp(force_r, (theta,), (v,))
    np.testing.assert_allclose(tf_, tr_, rtol=2e-4, atol=1e-5)


def test_third_order(graph):
    _, loss_f, theta, r = _force_training_setup(graph, use_family=True)
    _, loss_r, _, _ = _force_training_setup(graph, use_family=False)

    def outer(lossfn):
        return jax.grad(
            lambda th: jnp.sum(jax.grad(lossfn)(th, r) ** 2))(theta)

    np.testing.assert_allclose(outer(loss_f), outer(loss_r),
                               rtol=5e-4, atol=1e-4)


def test_gms_pallas_interpret_matches_xla(graph):
    """The TPU lowering path (fused Pallas kernel) in interpret mode must
    equal the XLA lowering for sizes above the dispatch threshold."""
    n, send, recv, perm, max_nodes, f = graph
    rs = np.random.RandomState(4)
    x = jnp.asarray(rs.randn(n, f), jnp.float32)
    m = jnp.asarray(rs.randn(len(send), f), jnp.float32)

    from gcnn_keras_tpu.ops.pallas.fused_aggregate import (
        _fused_gather_mul_segsum)
    out_k = _fused_gather_mul_segsum(
        x, m, jnp.asarray(send), jnp.asarray(recv), num_segments=n,
        max_nodes=max_nodes, interpret=True)
    ref = _chain(x, m, send, recv, n)
    # default kernel precision is the 2-term bf16 split (~1e-5 relative)
    np.testing.assert_allclose(out_k, ref, rtol=1e-4, atol=1e-4)

    # and the sender-sorted application the transpose rule makes
    inv = np.zeros_like(perm)
    inv[perm] = np.arange(len(perm), dtype=np.int32)
    out_t = _fused_gather_mul_segsum(
        x, m[perm], jnp.asarray(recv[perm]), jnp.asarray(send[perm]),
        num_segments=n, max_nodes=max_nodes, interpret=True)
    ref_t = jax.ops.segment_sum(jnp.take(x, recv, axis=0) * m, send, n)
    np.testing.assert_allclose(out_t, ref_t, rtol=1e-4, atol=1e-4)
