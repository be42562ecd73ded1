"""Pallas aggregation dispatch: on CPU the wrapper must always fall back to
XLA; the kernel itself is validated on TPU (see ops/pallas/segment_sum.py —
measured exact f32 parity and 1.7-1.9x over XLA scatter at E>=32k on v5e,
including grad-of-grad through linear_call)."""
import numpy as np
import jax
import jax.numpy as jnp

from gcnn_keras_tpu.ops.segment import segment_sum


def test_cpu_fallback_matches_reference():
    rs = np.random.RandomState(0)
    E, N, F = 20000, 2048, 64  # above the TPU dispatch threshold
    recv = np.sort(rs.randint(0, N, size=E)).astype(np.int32)
    vals = rs.randn(E, F).astype(np.float32)
    out = segment_sum(jnp.asarray(vals), jnp.asarray(recv), N,
                      indices_are_sorted=True)
    ref = jax.ops.segment_sum(jnp.asarray(vals), jnp.asarray(recv), N,
                              indices_are_sorted=True)
    assert np.allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_second_order_grad_through_segment_sum():
    """The force-training pattern: grad of a function of grad."""
    rs = np.random.RandomState(1)
    E, N, F = 256, 64, 8
    recv = np.sort(rs.randint(0, N, size=E)).astype(np.int32)
    v = jnp.asarray(rs.randn(E, F).astype(np.float32))
    r = jnp.asarray(recv)
    w = jnp.asarray(rs.randn(F).astype(np.float32))

    def inner(v):
        return jnp.sum(segment_sum(v, r, N, indices_are_sorted=True) * w)

    def loss(v):
        f = jax.grad(inner)(v)
        return jnp.sum(f * f)

    g = jax.grad(loss)(v)
    assert np.isfinite(np.asarray(g)).all()
    # analytic: inner grad = w[None] broadcast per edge -> constant; loss grad = 0
    assert np.allclose(np.asarray(g), 0.0, atol=1e-6)
