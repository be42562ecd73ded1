"""Pallas TPU kernel: batched small-SPD linear solve with the BATCH on
lanes (one kernel for the whole Qeq solve).

Why: the flagship HDNNP4th batch solves G=128 independent (M~21)-sized
SPD systems per train step.  XLA's batched Cholesky + triangular solves
lower to ~3*M tiny sequential fused ops (a while-loop of rank-1 updates)
— ~1.9 ms of a 6.3 ms step is this launch/serialization tax, not math
(the whole factorization is ~4 MFLOP).  This kernel runs the ENTIRE
Gauss-Jordan elimination for all G systems inside ONE Pallas launch:

- Layout (the fused-G4 lane-packing lesson, PERF.md r4): the G batch
  dimension sits on the 128 LANES; the (M, M) matrix occupies
  (outer, sublane) so every elimination step is a handful of full-width
  VPU ops over a (M, M, 128) block.  M pads to the sublane tile (8).
- No pivoting: A = erf-screened Coulomb + positive hardness diagonal
  (+ identity padding rows) is SPD and diagonally dominant — the same
  assumption the CG path already makes.  All row selection is done with
  arithmetic iota masks, never dynamic slicing.
- AD: wrapped in ``lax.custom_linear_solve(symmetric=True)`` so
  gradients (any order) use the implicit adjoint — the transpose of the
  solve is the SAME solve, and cotangents w.r.t. ``a`` flow through the
  differentiable matvec.  The solve closure carries no rhs-derived
  constants, so it stays transposable when staged with an unknown rhs
  (the _transposable_pcg lesson, qeq_solver.py).

Eligibility: M_pad <= 128 (block fits VMEM sublane tiling), any G
(grid over 128-lane blocks; G pads with identity systems).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

Array = jax.Array

_LANES = 128


def _gj_kernel(a_ref, b_ref, x_ref, *, m: int):
    a = a_ref[...].astype(jnp.float32)          # (M, M, G)
    b = b_ref[...].astype(jnp.float32)          # (M, K, G)
    row_mask3 = jax.lax.broadcasted_iota(jnp.int32, (m, 1, 1), 0)  # (M,1,1)
    col_mask3 = jax.lax.broadcasted_iota(jnp.int32, (1, m, 1), 1)  # (1,M,1)
    row_mask2 = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)     # (M,1)

    def body(step, carry):
        a, b = carry
        ek_r3 = (row_mask3 == step).astype(jnp.float32)   # row selector
        ek_c3 = (col_mask3 == step).astype(jnp.float32)   # column selector
        ek_r2 = (row_mask2 == step).astype(jnp.float32)
        rowk = jnp.sum(a * ek_r3, axis=0)                 # (M, G) row k
        bk = jnp.sum(b * ek_r3, axis=0)                   # (K, G)
        pivot = jnp.sum(rowk * ek_r2, axis=0)             # (G,) = a[k,k]
        inv_p = 1.0 / pivot
        rowk = rowk * inv_p[None, :]
        bk = bk * inv_p[None, :]
        colk = jnp.sum(a * ek_c3, axis=1)                 # (M, G) column k
        # eliminate col k from every OTHER row: factor[k] = 0 because
        # colk[k] == pivot
        factor = colk - ek_r2 * pivot[None, :]            # (M, G)
        a = a - factor[:, None, :] * rowk[None, :, :]
        b = b - factor[:, None, :] * bk[None, :, :]
        # normalize row k in place (it was untouched above)
        a = a * (1.0 - ek_r3) + ek_r3 * rowk[None, :, :]
        b = b * (1.0 - ek_r3) + ek_r3 * bk[None, :, :]
        return a, b

    _, b = jax.lax.fori_loop(0, m, body, (a, b))
    x_ref[...] = b.astype(x_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _gj_solve_impl(a: Array, b: Array, interpret: bool = False) -> Array:
    """Raw kernel call: ``a (G, M, M)`` SPD, ``b (G, M, K)`` -> ``x`` so
    that ``a @ x = b``.  Pads M to the sublane tile with identity
    rows/cols and G to 128-lane blocks with identity systems."""
    G, M, _ = a.shape
    K = b.shape[-1]
    m_pad = max(8, -(-M // 8) * 8)
    g_pad = -(-G // _LANES) * _LANES

    eye = jnp.eye(m_pad, dtype=a.dtype)
    a_p = jnp.tile(eye[None], (g_pad, 1, 1))
    a_p = a_p.at[:G, :M, :M].set(a)
    b_p = jnp.zeros((g_pad, m_pad, K), b.dtype).at[:G, :M, :].set(b)

    # batch on lanes: (M, M, G) / (M, K, G)
    a_t = jnp.transpose(a_p, (1, 2, 0))
    b_t = jnp.transpose(b_p, (1, 2, 0))

    grid = (g_pad // _LANES,)
    out = pl.pallas_call(
        functools.partial(_gj_kernel, m=m_pad),
        grid=grid,
        in_specs=[
            pl.BlockSpec((m_pad, m_pad, _LANES), lambda g: (0, 0, g)),
            pl.BlockSpec((m_pad, K, _LANES), lambda g: (0, 0, g)),
        ],
        out_specs=pl.BlockSpec((m_pad, K, _LANES), lambda g: (0, 0, g)),
        out_shape=jax.ShapeDtypeStruct((m_pad, K, g_pad), b.dtype),
        interpret=interpret,
    )(a_t, b_t)
    return jnp.transpose(out, (2, 0, 1))[:G, :M, :]


def spd_solve_lanes(a: Array, b: Array, interpret: bool = False) -> Array:
    """Differentiable batched SPD solve via the lane-packed Gauss-Jordan
    kernel: ``a (G, M, M)``, ``b (G, M, K)`` -> ``x (G, M, K)``.

    ``custom_linear_solve(symmetric=True)`` supplies exact implicit-
    function gradients of any order; only the matvec is differentiated.
    """

    def mv(x):
        return jnp.einsum("gij,gjk->gik", a, x,
                          precision=jax.lax.Precision.HIGHEST)

    def solve(mv_fn, rhs):
        return _gj_solve_impl(a, rhs, interpret=interpret)

    return jax.lax.custom_linear_solve(mv, b, solve=solve, symmetric=True)
