"""Fused cfconv kernel: CPU-side reference-impl checks (the Pallas path is
TPU-only and validated on-device — see PERF.md: exact-f32, 38x more accurate
than XLA's default bf16 matmul path, ~10% slower)."""
import numpy as np
import jax
import jax.numpy as jnp

from gcnn_keras_tpu.ops.pallas.fused_cfconv import (
    _reference_impl, fused_cfconv_auto, _ssp,
)


def _setup(E=256, N=64, B=8, U=16, seed=0):
    rs = np.random.RandomState(seed)
    recv = np.sort(rs.randint(0, N, size=E)).astype(np.int32)
    return (jnp.asarray(rs.randn(E, B).astype(np.float32)),
            jnp.asarray(rs.randn(E, U).astype(np.float32)),
            jnp.asarray(recv), N,
            jnp.asarray((rs.randn(B, U) * 0.1).astype(np.float32)),
            jnp.asarray((rs.randn(U) * 0.1).astype(np.float32)),
            jnp.asarray((rs.randn(U, U) * 0.1).astype(np.float32)),
            jnp.asarray((rs.randn(U) * 0.1).astype(np.float32)))


def test_reference_impl_matches_numpy():
    basis, xj, recv, N, w1, b1, w2, b2 = _setup()
    out = np.asarray(_reference_impl(basis, xj, recv, N, w1, b1, w2, b2))
    z1 = np.asarray(basis) @ np.asarray(w1) + np.asarray(b1)
    h = np.logaddexp(0, z1) - np.log(2)
    f = h @ np.asarray(w2) + np.asarray(b2)
    expect = np.zeros((N, out.shape[-1]), dtype=np.float64)
    np.add.at(expect, np.asarray(recv), np.asarray(xj) * f)
    assert np.allclose(out, expect, atol=1e-4)


def test_auto_dispatch_cpu_fallback_grads():
    basis, xj, recv, N, w1, b1, w2, b2 = _setup()

    def loss(basis, xj, w1):
        return jnp.sum(fused_cfconv_auto(basis, xj, recv, N, w1, b1, w2, b2) ** 2)

    g = jax.grad(loss, argnums=(0, 1, 2))(basis, xj, w1)
    for t in g:
        assert np.isfinite(np.asarray(t)).all()
