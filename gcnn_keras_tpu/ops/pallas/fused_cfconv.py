"""Fused SchNet continuous-filter convolution kernel for the INFERENCE/MD
path: basis -> filter-MLP -> multiply-with-sender-features -> segment-sum,
all in VMEM — the (E, U) filter and message tensors never touch HBM.

Rationale (PERF.md): the train/inference step is HBM-bandwidth bound while
using ~10% of the MXU; recomputing the filter MLP inside the aggregation
kernel trades cheap MXU FLOPs for the two largest intermediate HBM
round-trips of the forward pass.

Differentiation: FIRST-order custom VJP (backward recomputes the filter in
plain XLA) — sufficient for MD forces (grad wrt coordinates). Training needs
grad-of-grad, so the training path keeps the unfused XLA version
(`layers/conv/schnet.py`).

Layout: CSR row-block kernel like ops/pallas/segment_sum.py — grid over
128-row node blocks with scalar-prefetched per-block edge offsets; edges
sorted by receiver (GraphBatch invariant).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

N_BLK = 128
E_BLK = 512
_LOG2 = 0.6931471805599453


def _ssp(x):
    return jax.nn.softplus(x) - _LOG2


def _kernel(off_ref, recv_hbm, basis_hbm, xj_hbm, w1_ref, b1_ref, w2_ref,
            b2_ref, out_ref, acc, bscr, xscr, rscr, sems):
    i = pl.program_id(0)
    e0 = off_ref[i]
    e1 = off_ref[i + 1]
    start = (e0 // E_BLK) * E_BLK
    num_chunks = jax.lax.max((e1 + E_BLK - 1 - start) // E_BLK, 0)

    acc[...] = jnp.zeros_like(acc)
    row_base = i * N_BLK
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (N_BLK, E_BLK), 0) + row_base

    def get_dmas(slot, chunk):
        e_start = start + chunk * E_BLK
        return (
            pltpu.make_async_copy(basis_hbm.at[pl.ds(e_start, E_BLK), :],
                                  bscr.at[slot], sems.at[slot, 0]),
            pltpu.make_async_copy(xj_hbm.at[pl.ds(e_start, E_BLK), :],
                                  xscr.at[slot], sems.at[slot, 1]),
            pltpu.make_async_copy(recv_hbm.at[:, pl.ds(e_start, E_BLK)],
                                  rscr.at[slot], sems.at[slot, 2]),
        )

    @pl.when(num_chunks > 0)
    def _():
        for d in get_dmas(0, 0):
            d.start()

    def body(chunk, _):
        slot = chunk % 2
        nxt = (chunk + 1) % 2

        @pl.when(chunk + 1 < num_chunks)
        def _():
            for d in get_dmas(nxt, chunk + 1):
                d.start()

        for d in get_dmas(slot, chunk):
            d.wait()

        basis = bscr[slot]          # (E_BLK, B)
        xj = xscr[slot]             # (E_BLK, U)
        recv = rscr[slot]           # (1, E_BLK)
        z1 = jax.lax.dot_general(
            basis, w1_ref[...], (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32) + b1_ref[...]
        f = jax.lax.dot_general(
            _ssp(z1), w2_ref[...], (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32) + b2_ref[...]
        msg = xj * f
        onehot = (recv == row_ids).astype(msg.dtype)
        acc[...] += jax.lax.dot_general(
            onehot, msg, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)
        return ()

    jax.lax.fori_loop(0, num_chunks, body, (), unroll=False)
    out_ref[...] = acc[...]


def _pad_lane(x: Array, to: int = 128) -> Array:
    f = x.shape[-1]
    pad = (-f) % to
    if pad:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
    return x


@functools.partial(jax.jit, static_argnames=("num_nodes",))
def _fused_cfconv_impl(basis, xj, receivers, num_nodes, w1, b1, w2, b2):
    e, b_dim = basis.shape
    u = xj.shape[-1]
    basis_p = _pad_lane(basis)
    w1_p = jnp.pad(w1, ((0, basis_p.shape[-1] - b_dim), (0, (-u) % 128)))
    xj_p = _pad_lane(xj)
    w2_p = jnp.pad(w2, ((0, (-u) % 128), (0, (-u) % 128)))
    b1_p = _pad_lane(b1[None, :])
    b2_p = _pad_lane(b2[None, :])
    u_p = xj_p.shape[-1]
    bp = basis_p.shape[-1]

    n_pad = ((num_nodes + N_BLK - 1) // N_BLK) * N_BLK
    e_pad = ((e + E_BLK - 1) // E_BLK) * E_BLK
    if e_pad != e:
        basis_p = jnp.pad(basis_p, ((0, e_pad - e), (0, 0)))
        xj_p = jnp.pad(xj_p, ((0, e_pad - e), (0, 0)))
        receivers = jnp.pad(receivers, (0, e_pad - e),
                            constant_values=jnp.int32(n_pad))
    recv = receivers.astype(jnp.int32)
    bounds = jnp.arange(0, n_pad + 1, N_BLK, dtype=jnp.int32)
    offsets = jnp.searchsorted(recv, bounds, side="left").astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_pad // N_BLK,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),   # receivers (1, E)
            pl.BlockSpec(memory_space=pltpu.ANY),   # basis (E, B)
            pl.BlockSpec(memory_space=pltpu.ANY),   # xj (E, U)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w1 (B, U)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b1 (1, U)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w2 (U, U)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b2 (1, U)
        ],
        out_specs=pl.BlockSpec((N_BLK, u_p), lambda i, off: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((N_BLK, u_p), jnp.float32),
            pltpu.VMEM((2, E_BLK, bp), jnp.float32),
            pltpu.VMEM((2, E_BLK, u_p), jnp.float32),
            pltpu.VMEM((2, 1, E_BLK), jnp.int32),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
    )
    out = pl.pallas_call(
        _kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, u_p), jnp.float32),
    )(offsets, recv[None, :], basis_p, xj_p, w1_p, b1_p, w2_p, b2_p)
    return out[:num_nodes, :u]


def _reference_impl(basis, xj, receivers, num_nodes, w1, b1, w2, b2):
    f = _ssp(basis @ w1 + b1) @ w2 + b2
    return jax.ops.segment_sum(xj * f, receivers, num_nodes,
                               indices_are_sorted=True)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_cfconv(basis, xj, receivers, num_nodes, w1, b1, w2, b2):
    """Fused cfconv for receiver-sorted edges. First-order differentiable
    (custom VJP with XLA recompute backward). TPU only; call
    ``fused_cfconv_auto`` for a backend-dispatching version."""
    return _fused_cfconv_impl(basis, xj, receivers, num_nodes, w1, b1, w2, b2)


def _fwd(basis, xj, receivers, num_nodes, w1, b1, w2, b2):
    out = _fused_cfconv_impl(basis, xj, receivers, num_nodes, w1, b1, w2, b2)
    return out, (basis, xj, receivers, w1, b1, w2, b2)


def _bwd(num_nodes, res, g):
    basis, xj, receivers, w1, b1, w2, b2 = res
    # recompute filter in XLA (backward runs once per force evaluation)
    z1 = basis @ w1 + b1
    h = _ssp(z1)
    f = h @ w2 + b2
    g_e = jnp.take(g, receivers, axis=0)       # (E, U)
    d_xj = g_e * f
    d_f = g_e * xj
    d_h = d_f @ w2.T
    d_z1 = d_h * jax.nn.sigmoid(z1)            # softplus' = sigmoid
    d_basis = d_z1 @ w1.T
    d_w1 = basis.T @ d_z1
    d_b1 = jnp.sum(d_z1, axis=0)
    d_w2 = h.T @ d_f
    d_b2 = jnp.sum(d_f, axis=0)
    return d_basis, d_xj, None, d_w1, d_b1, d_w2, d_b2


fused_cfconv.defvjp(_fwd, _bwd)


def fused_cfconv_auto(basis, xj, receivers, num_nodes, w1, b1, w2, b2):
    """Dispatch: Pallas kernel on TPU, XLA reference elsewhere."""
    if jax.default_backend() == "tpu":
        return fused_cfconv(basis, xj, receivers, num_nodes, w1, b1, w2, b2)
    return _reference_impl(basis, xj, receivers, num_nodes, w1, b1, w2, b2)
