"""Pallas TPU kernels: fully fused SchNet cfconv chain, AD-closed to the
second order reverse-over-reverse training uses (VERDICT r4 item 1).

The chain per (receiver-sorted) edge e = (i <- j):

    v = pos[j] - pos[i];  r = |v|               (edge_distances semantics)
    b_k = exp(-(r - offset - mu_k)^2 / (2 sigma^2))   (gauss_basis)
    z1 = W1^T b + b1;  h = ssp(z1)              (Dense filter_1)
    F  = W2^T h + b2                            (Dense filter_2)
    y[i] += F * x[j]                            (gather-mul-segment-sum)

The unfused XLA step materializes the (E, U) filter/gather/message arrays
in HBM in every AD traversal; the r5 measured roofline position
(bench.py sec_hbm_traffic: 4.06 GB/step = 48% of HBM peak, 7.2% MFU)
says the step is LATENCY-bound on those per-op round trips, not
bandwidth- or compute-bound — the fused kernels keep the whole edge-space
chain in VMEM.

Layout: the fused-G4 recipe (``fused_g4.py``) — grid over 128-row node
blocks, receiver-sorted CSR offsets, windowed one-hot gathers as MXU
matmuls against an (U, N) TRANSPOSED node table, per-edge scalars
lane-packed as (1, E_BLK) rows.

AD closure with THREE kernels; unlike G4 the chain has trainable
parameters (W1, b1, W2, b2 — biases folded into augmented weight rows),
so the derivative kernels compute parameter cotangents too, accumulated
across grid steps into constant-index output blocks:

- ``fwd``:     y(x, pos, th)
- ``vjp``:     ct -> (ct_x, ct_pos, ct_th)          (any first reverse)
- ``hesjvp``:  (ct, u) -> (J u,  grad_res <ct, J(res) u>)
               (the second reverse through the force pass: transposing
               the vjp's linear-in-ct part onto J u, plus the honest
               second-order residual terms)

wired as nested ``custom_vjp`` (CF's bwd is itself a custom_vjp whose bwd
invokes ``hesjvp``) — exactly the traversal set energy+force training's
reverse-over-reverse needs. NOT forward-mode differentiable (use the
default reverse force path, not training/fast_force_step.py).

Inside each kernel the per-edge chain derivatives come from ``jax.vjp`` /
``jax.jvp`` / ``jax.grad`` OVER THE SHARED CLOSURE ``_chain`` — traced at
kernel-build time into plain VPU/MXU ops, so all three kernels share one
definition of the math and cannot drift from each other (hand-derived
Hessian kernels were the main correctness risk; tests pin every order
against XLA autodiff of the reference chain).

Scope (gated by the caller): reference cfconv config (shifted_softplus,
bias, sum-pool), f32, non-periodic (no range_image shifts in-kernel),
single-device batches, ``edge_window_local`` (every sender within +-128
rows of its receiver — the batching invariant for max_nodes <= 128, and
locality-sorted giant molecules).

Parity note: padding edges contribute NOTHING here (their receiver is
folded to the dead row), while the unfused path accumulates them onto
the dead last node; real-node outputs are identical.
"""
from __future__ import annotations

import functools
import math
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_g4 import (N_BLK, W_WIN, _block_window, _dot_nt, _gather_t,
                       _prep_edges, _sum3)

Array = jax.Array

E_BLK = 1024
# the hesjvp kernel holds ~3x the live (U, B) registers of the others; at
# B=1024 it overflows the 16 MB scoped-VMEM stack (measured 19.04M on the
# v5e) — it runs at half the chunk size instead
E_BLK_HES = 512
_LOG2 = 0.6931471805599453

# Tests set True to run the kernels in interpreter mode on CPU (the
# eligibility gate then also waives the TPU-backend requirement).
FORCE_INTERPRET = False


class CFStatic(NamedTuple):
    """Static chain configuration baked into the kernels."""
    bins: int
    distance_max: float
    offset: float
    sigma: float
    units: int           # U (filter width)

    @property
    def k_aug(self) -> int:
        """Augmented basis rows (bins + ones row), padded to the tile."""
        return ((self.bins + 1 + 7) // 8) * 8

    @property
    def u_pad(self) -> int:
        return ((self.units + 7) // 8) * 8

    @property
    def u_aug(self) -> int:
        """Augmented hidden rows (u_pad + ones row padded to a tile)."""
        return self.u_pad + 8


def _hi_lo(v):
    hi = v.astype(jnp.bfloat16)
    lo = (v - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _gather_rows(tab, oh):
    """(R, W) table gathered by a (W, B) one-hot -> (R, B); 2-term bf16
    split on the table (activations/cotangents; ~1e-7 rel)."""
    dims = (((1,), (0,)), ((), ()))
    ohb = oh.astype(jnp.bfloat16)
    hi, lo = _hi_lo(tab)
    out = jax.lax.dot_general(hi, ohb, dims,
                              preferred_element_type=jnp.float32)
    return out + jax.lax.dot_general(lo, ohb, dims,
                                     preferred_element_type=jnp.float32)


def _chain(st: CFStatic, pi, pj, xj, w1a, w2a):
    """The per-edge cfconv chain on transposed registers.

    pi, pj: (8, B) gathered positions (xyz on sublanes 0-2);
    xj: (u_pad, B) gathered sender features;
    w1a: (k_aug, u_pad) filter_1 weights with b1 in row ``bins``;
    w2a: (u_aug, u_pad) filter_2 weights with b2 in row ``u_pad``.
    Returns the message m = F * xj, (u_pad, B).

    All in-chain matmuls run f32 Precision.HIGHEST: they are tiny
    relative to the gathers, and exactness here keeps every AD order
    within f32 noise of the unfused reference path.
    """
    eps = 1e-12
    v = pj - pi
    d2 = _sum3(v * v)
    d = jnp.sqrt(jnp.maximum(d2, eps))
    d = jnp.where(d2 > eps, d, math.sqrt(eps))      # edge_distances
    gamma = -0.5 / (st.sigma * st.sigma)
    rows = []
    for k in range(st.bins):
        mu = float(k) / float(st.bins) * st.distance_max
        diff = d - (st.offset + mu)
        rows.append(jnp.exp(gamma * diff * diff))
    rows.append(jnp.ones_like(d))                   # bias row
    rows += [jnp.zeros_like(d)] * (st.k_aug - st.bins - 1)
    b = jnp.concatenate(rows, axis=0)               # (k_aug, B)
    z1 = jax.lax.dot_general(w1a, b, (((0,), (0,)), ((), ())),
                             precision=jax.lax.Precision.HIGHEST,
                             preferred_element_type=jnp.float32)
    h = jax.nn.softplus(z1) - _LOG2                 # (u_pad, B)
    ones = jnp.ones_like(h[:1])
    h_aug = jnp.concatenate(
        [h, ones] + [jnp.zeros_like(ones)] * (st.u_aug - st.u_pad - 1),
        axis=0)                                     # (u_aug, B)
    f = jax.lax.dot_general(w2a, h_aug, (((0,), (0,)), ((), ())),
                            precision=jax.lax.Precision.HIGHEST,
                            preferred_element_type=jnp.float32)
    return f * xj


def _row_mask3(x):
    rows = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    return jnp.where(rows < 3, x, 0.0)


def _pad_lanes(x, to=128):
    return jnp.pad(x, ((0, 0), (0, to - x.shape[1])))


# ------------------------------------------------------------- kernels ---

def _chunk_setup(off_ref, i, n_pad, e_blk):
    e0 = off_ref[i]
    e1 = off_ref[i + 1]
    start = (e0 // e_blk) * e_blk
    num_chunks = jax.lax.max(((e1 + e_blk - 1 - start) // e_blk), 0)
    s_lo = _block_window(i, n_pad)
    return start, num_chunks, s_lo


def _ids_dma(ids_hbm, iscr, sems, start, e_blk):
    def dma(slot, chunk):
        a0 = start + chunk * e_blk
        return pltpu.make_async_copy(
            ids_hbm.at[:, pl.ds(a0, e_blk)], iscr.at[slot], sems.at[slot])
    return dma


def _onehots(ids, win_ids, row_ids):
    oh_i = (ids[0:1] == win_ids).astype(jnp.float32)   # receiver in window
    oh_j = (ids[1:2] == win_ids).astype(jnp.float32)   # sender in window
    oh_r = (ids[0:1] == row_ids).astype(jnp.float32)   # receiver in block
    return oh_i, oh_j, oh_r


def _make_fwd_kernel(st: CFStatic, n_pad: int):
    def kernel(off_ref, ids_hbm, x_hbm, p_hbm, w1a_ref, w2a_ref, out_ref,
               acc, xwin, pwin, iscr, sems, xsem, psem):
        i = pl.program_id(0)
        start, num_chunks, s_lo = _chunk_setup(off_ref, i, n_pad, E_BLK)
        pltpu.make_async_copy(x_hbm.at[:, pl.ds(s_lo, W_WIN)], xwin,
                              xsem).start()
        pltpu.make_async_copy(p_hbm.at[:, pl.ds(s_lo, W_WIN)], pwin,
                              psem).start()
        acc[...] = jnp.zeros_like(acc)
        row_ids = jax.lax.broadcasted_iota(
            jnp.int32, (N_BLK, E_BLK), 0) + i * N_BLK
        win_ids = jax.lax.broadcasted_iota(
            jnp.int32, (W_WIN, E_BLK), 0) + s_lo
        dma = _ids_dma(ids_hbm, iscr, sems, start, E_BLK)

        @pl.when(num_chunks > 0)
        def _():
            dma(0, 0).start()

        pltpu.make_async_copy(x_hbm.at[:, pl.ds(s_lo, W_WIN)], xwin,
                              xsem).wait()
        pltpu.make_async_copy(p_hbm.at[:, pl.ds(s_lo, W_WIN)], pwin,
                              psem).wait()

        def body(chunk, _):
            slot = chunk % 2

            @pl.when(chunk + 1 < num_chunks)
            def _():
                dma((chunk + 1) % 2, chunk + 1).start()

            dma(slot, chunk).wait()
            oh_i, oh_j, oh_r = _onehots(iscr[slot], win_ids, row_ids)
            pi = _gather_t(pwin[...], oh_i)
            pj = _gather_t(pwin[...], oh_j)
            xj = _gather_rows(xwin[...], oh_j)
            m = _chain(st, pi, pj, xj, w1a_ref[...], w2a_ref[...])
            acc[...] += _dot_nt(oh_r, m)
            return ()

        jax.lax.fori_loop(0, num_chunks, body, (), unroll=False)
        out_ref[...] = acc[...].astype(out_ref.dtype)

    return kernel


def _make_vjp_kernel(st: CFStatic, n_pad: int):
    def kernel(off_ref, ids_hbm, x_hbm, p_hbm, ct_hbm, w1a_ref, w2a_ref,
               dpc_ref, dpw_ref, dxw_ref, dw1_ref, dw2_ref,
               accp, accpw, accxw, xwin, pwin, ctblk, iscr, sems, xsem,
               psem, ctsem):
        i = pl.program_id(0)
        start, num_chunks, s_lo = _chunk_setup(off_ref, i, n_pad, E_BLK)
        pltpu.make_async_copy(x_hbm.at[:, pl.ds(s_lo, W_WIN)], xwin,
                              xsem).start()
        pltpu.make_async_copy(p_hbm.at[:, pl.ds(s_lo, W_WIN)], pwin,
                              psem).start()
        pltpu.make_async_copy(ct_hbm.at[:, pl.ds(i * N_BLK, N_BLK)], ctblk,
                              ctsem).start()
        accp[...] = jnp.zeros_like(accp)
        accpw[...] = jnp.zeros_like(accpw)
        accxw[...] = jnp.zeros_like(accxw)

        @pl.when(i == 0)
        def _():
            dw1_ref[...] = jnp.zeros_like(dw1_ref)
            dw2_ref[...] = jnp.zeros_like(dw2_ref)

        row_ids = jax.lax.broadcasted_iota(
            jnp.int32, (N_BLK, E_BLK), 0) + i * N_BLK
        win_ids = jax.lax.broadcasted_iota(
            jnp.int32, (W_WIN, E_BLK), 0) + s_lo
        dma = _ids_dma(ids_hbm, iscr, sems, start, E_BLK)

        @pl.when(num_chunks > 0)
        def _():
            dma(0, 0).start()

        pltpu.make_async_copy(x_hbm.at[:, pl.ds(s_lo, W_WIN)], xwin,
                              xsem).wait()
        pltpu.make_async_copy(p_hbm.at[:, pl.ds(s_lo, W_WIN)], pwin,
                              psem).wait()
        pltpu.make_async_copy(ct_hbm.at[:, pl.ds(i * N_BLK, N_BLK)], ctblk,
                              ctsem).wait()

        def body(chunk, _):
            slot = chunk % 2

            @pl.when(chunk + 1 < num_chunks)
            def _():
                dma((chunk + 1) % 2, chunk + 1).start()

            dma(slot, chunk).wait()
            ids = iscr[slot]
            oh_i, oh_j, oh_r = _onehots(ids, win_ids, row_ids)
            pi = _gather_t(pwin[...], oh_i)
            pj = _gather_t(pwin[...], oh_j)
            xj = _gather_rows(xwin[...], oh_j)
            # per-edge cotangent of the message: rows of the block ct
            ct_m = _gather_rows(ctblk[...], oh_r)       # (u_pad, B)

            _, pull = jax.vjp(
                lambda a, b, c, d, e: _chain(st, a, b, c, d, e),
                pi, pj, xj, w1a_ref[...], w2a_ref[...])
            d_pi, d_pj, d_xj, d_w1a, d_w2a = pull(ct_m)

            accp[...] += _pad_lanes(_dot_nt(oh_r, _row_mask3(d_pi)))
            accpw[...] += _pad_lanes(_dot_nt(oh_j, _row_mask3(d_pj)))
            accxw[...] += _dot_nt(oh_j, d_xj)
            dw1_ref[...] += d_w1a
            dw2_ref[...] += d_w2a
            return ()

        jax.lax.fori_loop(0, num_chunks, body, (), unroll=False)
        dpc_ref[...] = accp[...].astype(dpc_ref.dtype)
        dpw_ref[...] = accpw[...].astype(dpw_ref.dtype)[None]
        dxw_ref[...] = accxw[...].astype(dxw_ref.dtype)[None]

    return kernel


def _make_hesjvp_kernel(st: CFStatic, n_pad: int):
    def kernel(off_ref, ids_hbm, x_hbm, p_hbm, ct_hbm, ux_hbm, up_hbm,
               w1a_ref, w2a_ref, uw1_ref, uw2_ref,
               ju_ref, wpc_ref, wpw_ref, wxw_ref, ww1_ref, ww2_ref,
               accju, accp, accpw, accxw, xwin, pwin, uxwin, upwin, ctblk,
               iscr, sems, xsem, psem, uxsem, upsem, ctsem):
        i = pl.program_id(0)
        start, num_chunks, s_lo = _chunk_setup(off_ref, i, n_pad,
                                               E_BLK_HES)
        pltpu.make_async_copy(x_hbm.at[:, pl.ds(s_lo, W_WIN)], xwin,
                              xsem).start()
        pltpu.make_async_copy(p_hbm.at[:, pl.ds(s_lo, W_WIN)], pwin,
                              psem).start()
        pltpu.make_async_copy(ux_hbm.at[:, pl.ds(s_lo, W_WIN)], uxwin,
                              uxsem).start()
        pltpu.make_async_copy(up_hbm.at[:, pl.ds(s_lo, W_WIN)], upwin,
                              upsem).start()
        pltpu.make_async_copy(ct_hbm.at[:, pl.ds(i * N_BLK, N_BLK)], ctblk,
                              ctsem).start()
        accju[...] = jnp.zeros_like(accju)
        accp[...] = jnp.zeros_like(accp)
        accpw[...] = jnp.zeros_like(accpw)
        accxw[...] = jnp.zeros_like(accxw)

        @pl.when(i == 0)
        def _():
            ww1_ref[...] = jnp.zeros_like(ww1_ref)
            ww2_ref[...] = jnp.zeros_like(ww2_ref)

        row_ids = jax.lax.broadcasted_iota(
            jnp.int32, (N_BLK, E_BLK_HES), 0) + i * N_BLK
        win_ids = jax.lax.broadcasted_iota(
            jnp.int32, (W_WIN, E_BLK_HES), 0) + s_lo
        dma = _ids_dma(ids_hbm, iscr, sems, start, E_BLK_HES)

        @pl.when(num_chunks > 0)
        def _():
            dma(0, 0).start()

        for ref, sem, hbm in ((xwin, xsem, x_hbm), (pwin, psem, p_hbm),
                              (uxwin, uxsem, ux_hbm),
                              (upwin, upsem, up_hbm)):
            pltpu.make_async_copy(hbm.at[:, pl.ds(s_lo, W_WIN)], ref,
                                  sem).wait()
        pltpu.make_async_copy(ct_hbm.at[:, pl.ds(i * N_BLK, N_BLK)], ctblk,
                              ctsem).wait()

        def body(chunk, _):
            slot = chunk % 2

            @pl.when(chunk + 1 < num_chunks)
            def _():
                dma((chunk + 1) % 2, chunk + 1).start()

            dma(slot, chunk).wait()
            ids = iscr[slot]
            oh_i, oh_j, oh_r = _onehots(ids, win_ids, row_ids)
            pi = _gather_t(pwin[...], oh_i)
            pj = _gather_t(pwin[...], oh_j)
            xj = _gather_rows(xwin[...], oh_j)
            dpi = _gather_t(upwin[...], oh_i)
            dpj = _gather_t(upwin[...], oh_j)
            dxj = _gather_rows(uxwin[...], oh_j)
            ct_m = _gather_rows(ctblk[...], oh_r)
            w1a = w1a_ref[...]
            w2a = w2a_ref[...]
            uw1 = uw1_ref[...]
            uw2 = uw2_ref[...]

            def ju_fn(a, b, c, d, e):
                # J(res) @ u on this chunk's edges
                return jax.jvp(
                    lambda *r: _chain(st, *r), (a, b, c, d, e),
                    (dpi, dpj, dxj, uw1, uw2))[1]

            def s_fn(a, b, c, d, e):
                return jnp.sum(ct_m * ju_fn(a, b, c, d, e))

            ju_m = ju_fn(pi, pj, xj, w1a, w2a)
            w_pi, w_pj, w_xj, w_w1a, w_w2a = jax.grad(
                s_fn, argnums=(0, 1, 2, 3, 4))(pi, pj, xj, w1a, w2a)

            accju[...] += _dot_nt(oh_r, ju_m)
            accp[...] += _pad_lanes(_dot_nt(oh_r, _row_mask3(w_pi)))
            accpw[...] += _pad_lanes(_dot_nt(oh_j, _row_mask3(w_pj)))
            accxw[...] += _dot_nt(oh_j, w_xj)
            ww1_ref[...] += w_w1a
            ww2_ref[...] += w_w2a
            return ()

        jax.lax.fori_loop(0, num_chunks, body, (), unroll=False)
        ju_ref[...] = accju[...].astype(ju_ref.dtype)
        wpc_ref[...] = accp[...].astype(wpc_ref.dtype)
        wpw_ref[...] = accpw[...].astype(wpw_ref.dtype)[None]
        wxw_ref[...] = accxw[...].astype(wxw_ref.dtype)[None]

    return kernel


# ------------------------------------------------------------ wrappers ---

def _pack_x_t(x: Array, u_pad: int, n_pad: int) -> Array:
    """(N, U) -> (u_pad, n_pad) transposed zero-padded table."""
    n, u = x.shape
    out = jnp.zeros((u_pad, n_pad), jnp.float32)
    return out.at[:u, :n].set(jnp.transpose(x).astype(jnp.float32))


def _pack_p_t(pos: Array, n_pad: int) -> Array:
    n = pos.shape[0]
    out = jnp.zeros((8, n_pad), jnp.float32)
    return out.at[:3, :n].set(jnp.transpose(pos).astype(jnp.float32))


def _combine_windows(center, wins, n_pad, lanes):
    """Per-block window accumulators added at their offsets (G4 pattern)."""
    full = center
    n_blocks = wins.shape[0]
    for b in range(n_blocks):
        s_lo = min(max((b - 1) * N_BLK, 0), n_pad - W_WIN)
        full = jax.lax.dynamic_update_slice(
            full,
            jax.lax.dynamic_slice(full, (s_lo, 0), (W_WIN, full.shape[1]))
            + wins[b], (s_lo, 0))
    return full[:, :lanes]


def _grid_spec(n_pad, n_hbm_inputs, n_vmem_inputs, out_specs,
               scratch_shapes):
    return pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_pad // N_BLK,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * n_hbm_inputs
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * n_vmem_inputs,
        out_specs=out_specs,
        scratch_shapes=scratch_shapes)


@functools.partial(jax.jit, static_argnames=("st", "n_node", "interpret"))
def _cf_fwd(x, pos, w1a, w2a, senders, receivers, edge_mask,
            st: CFStatic, n_node: int, interpret: bool = False):
    ids, offsets, _, n_pad = _prep_edges(senders, receivers, edge_mask,
                                         n_node, 0)
    x_t = _pack_x_t(x, st.u_pad, n_pad)
    p_t = _pack_p_t(pos, n_pad)
    out = pl.pallas_call(
        _make_fwd_kernel(st, n_pad),
        grid_spec=_grid_spec(
            n_pad, 3, 2,
            pl.BlockSpec((N_BLK, st.u_pad), lambda i, off: (i, 0),
                         memory_space=pltpu.VMEM),
            [pltpu.VMEM((N_BLK, st.u_pad), jnp.float32),
             pltpu.VMEM((st.u_pad, W_WIN), jnp.float32),
             pltpu.VMEM((8, W_WIN), jnp.float32),
             pltpu.VMEM((2, 4, E_BLK), jnp.int32),
             pltpu.SemaphoreType.DMA((2,)),
             pltpu.SemaphoreType.DMA,
             pltpu.SemaphoreType.DMA]),
        out_shape=jax.ShapeDtypeStruct((n_pad, st.u_pad), jnp.float32),
        interpret=interpret,
    )(offsets, ids, x_t, p_t, w1a, w2a)
    return out[:n_node, :st.units]


def _ct_t(ct, st, n_pad, n_node):
    out = jnp.zeros((st.u_pad, n_pad), jnp.float32)
    return out.at[:st.units, :n_node].set(
        jnp.transpose(ct).astype(jnp.float32))


@functools.partial(jax.jit, static_argnames=("st", "n_node", "interpret"))
def _cf_vjp(x, pos, w1a, w2a, ct, senders, receivers, edge_mask,
            st: CFStatic, n_node: int, interpret: bool = False):
    ids, offsets, _, n_pad = _prep_edges(senders, receivers, edge_mask,
                                         n_node, 0)
    x_t = _pack_x_t(x, st.u_pad, n_pad)
    p_t = _pack_p_t(pos, n_pad)
    ct_t = _ct_t(ct, st, n_pad, n_node)
    n_blocks = n_pad // N_BLK

    def const(i, off):
        return (0, 0)
    out_specs = [
        pl.BlockSpec((N_BLK, 128), lambda i, off: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, W_WIN, 128), lambda i, off: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, W_WIN, st.u_pad), lambda i, off: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((st.k_aug, st.u_pad), const, memory_space=pltpu.VMEM),
        pl.BlockSpec((st.u_aug, st.u_pad), const, memory_space=pltpu.VMEM),
    ]
    scratch = [
        pltpu.VMEM((N_BLK, 128), jnp.float32),
        pltpu.VMEM((W_WIN, 128), jnp.float32),
        pltpu.VMEM((W_WIN, st.u_pad), jnp.float32),
        pltpu.VMEM((st.u_pad, W_WIN), jnp.float32),
        pltpu.VMEM((8, W_WIN), jnp.float32),
        pltpu.VMEM((st.u_pad, N_BLK), jnp.float32),
        pltpu.VMEM((2, 4, E_BLK), jnp.int32),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.DMA,
        pltpu.SemaphoreType.DMA,
        pltpu.SemaphoreType.DMA,
    ]
    dpc, dpw, dxw, dw1, dw2 = pl.pallas_call(
        _make_vjp_kernel(st, n_pad),
        grid_spec=_grid_spec(n_pad, 4, 2, out_specs, scratch),
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, 128), jnp.float32),
            jax.ShapeDtypeStruct((n_blocks, W_WIN, 128), jnp.float32),
            jax.ShapeDtypeStruct((n_blocks, W_WIN, st.u_pad), jnp.float32),
            jax.ShapeDtypeStruct((st.k_aug, st.u_pad), jnp.float32),
            jax.ShapeDtypeStruct((st.u_aug, st.u_pad), jnp.float32),
        ],
        interpret=interpret,
    )(offsets, ids, x_t, p_t, ct_t, w1a, w2a)
    d_pos = _combine_windows(dpc, dpw, n_pad, 3)[:n_node]
    d_x = _combine_windows(jnp.zeros((n_pad, st.u_pad), jnp.float32), dxw,
                           n_pad, st.units)[:n_node]
    return d_x, d_pos, dw1, dw2


@functools.partial(jax.jit, static_argnames=("st", "n_node", "interpret"))
def _cf_hesjvp(x, pos, w1a, w2a, ct, u_x, u_pos, u_w1a, u_w2a,
               senders, receivers, edge_mask, st: CFStatic, n_node: int,
               interpret: bool = False):
    ids, offsets, _, n_pad = _prep_edges(senders, receivers, edge_mask,
                                         n_node, 0)
    x_t = _pack_x_t(x, st.u_pad, n_pad)
    p_t = _pack_p_t(pos, n_pad)
    ux_t = _pack_x_t(u_x, st.u_pad, n_pad)
    up_t = _pack_p_t(u_pos, n_pad)
    ct_t = _ct_t(ct, st, n_pad, n_node)
    n_blocks = n_pad // N_BLK

    def const(i, off):
        return (0, 0)
    out_specs = [
        pl.BlockSpec((N_BLK, st.u_pad), lambda i, off: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((N_BLK, 128), lambda i, off: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, W_WIN, 128), lambda i, off: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, W_WIN, st.u_pad), lambda i, off: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((st.k_aug, st.u_pad), const, memory_space=pltpu.VMEM),
        pl.BlockSpec((st.u_aug, st.u_pad), const, memory_space=pltpu.VMEM),
    ]
    scratch = [
        pltpu.VMEM((N_BLK, st.u_pad), jnp.float32),
        pltpu.VMEM((N_BLK, 128), jnp.float32),
        pltpu.VMEM((W_WIN, 128), jnp.float32),
        pltpu.VMEM((W_WIN, st.u_pad), jnp.float32),
        pltpu.VMEM((st.u_pad, W_WIN), jnp.float32),
        pltpu.VMEM((8, W_WIN), jnp.float32),
        pltpu.VMEM((st.u_pad, W_WIN), jnp.float32),
        pltpu.VMEM((8, W_WIN), jnp.float32),
        pltpu.VMEM((st.u_pad, N_BLK), jnp.float32),
        pltpu.VMEM((2, 4, E_BLK_HES), jnp.int32),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.DMA,
        pltpu.SemaphoreType.DMA,
        pltpu.SemaphoreType.DMA,
        pltpu.SemaphoreType.DMA,
        pltpu.SemaphoreType.DMA,
    ]
    ju, wpc, wpw, wxw, ww1, ww2 = pl.pallas_call(
        _make_hesjvp_kernel(st, n_pad),
        grid_spec=_grid_spec(n_pad, 6, 4, out_specs, scratch),
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, st.u_pad), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, 128), jnp.float32),
            jax.ShapeDtypeStruct((n_blocks, W_WIN, 128), jnp.float32),
            jax.ShapeDtypeStruct((n_blocks, W_WIN, st.u_pad), jnp.float32),
            jax.ShapeDtypeStruct((st.k_aug, st.u_pad), jnp.float32),
            jax.ShapeDtypeStruct((st.u_aug, st.u_pad), jnp.float32),
        ],
        interpret=interpret,
    )(offsets, ids, x_t, p_t, ct_t, ux_t, up_t, w1a, w2a, u_w1a, u_w2a)
    w_pos = _combine_windows(wpc, wpw, n_pad, 3)[:n_node]
    w_x = _combine_windows(jnp.zeros((n_pad, st.u_pad), jnp.float32), wxw,
                           n_pad, st.units)[:n_node]
    return ju[:n_node, :st.units], w_x, w_pos, ww1, ww2


# -------------------------------------------------------- public entry ---

def _augment(w1, b1, w2, b2, st: CFStatic):
    """Fold biases into weight rows: w1a (k_aug, u_pad), w2a (u_aug, u_pad)."""
    w1a = jnp.zeros((st.k_aug, st.u_pad), jnp.float32)
    w1a = w1a.at[:st.bins, :st.units].set(w1.astype(jnp.float32))
    w1a = w1a.at[st.bins, :st.units].set(b1.astype(jnp.float32))
    w2a = jnp.zeros((st.u_aug, st.u_pad), jnp.float32)
    w2a = w2a.at[:st.units, :st.units].set(w2.astype(jnp.float32))
    w2a = w2a.at[st.u_pad, :st.units].set(b2.astype(jnp.float32))
    return w1a, w2a


def cfconv_fused_chain(x: Array, pos: Array, w1: Array, b1: Array,
                       w2: Array, b2: Array, senders: Array,
                       receivers: Array, edge_mask: Array, st: CFStatic,
                       n_node: int, interpret: bool = False) -> Array:
    """Fully fused differentiable cfconv: ``y = segsum(filter(|dpos|) *
    gather(x))`` with energy+force training's complete reverse-over-
    reverse closed over the three kernels (module docstring).

    Reverse-mode only: wrapped as nested ``custom_vjp``.
    """
    w1a0, w2a0 = _augment(w1, b1, w2, b2, st)

    @jax.custom_vjp
    def CF(x_, pos_, w1a, w2a):
        return _cf_fwd(x_, pos_, w1a, w2a, senders, receivers, edge_mask,
                       st, n_node, interpret=interpret)

    def CF_fwd(x_, pos_, w1a, w2a):
        return CF(x_, pos_, w1a, w2a), (x_, pos_, w1a, w2a)

    @jax.custom_vjp
    def BWD(res, ct):
        x_, pos_, w1a, w2a = res
        return _cf_vjp(x_, pos_, w1a, w2a, ct, senders, receivers,
                       edge_mask, st, n_node, interpret=interpret)

    def BWD_fwd(res, ct):
        return BWD(res, ct), (res, ct)

    def BWD_bwd(saved, u):
        res, ct = saved
        x_, pos_, w1a, w2a = res
        u_x, u_pos, u_w1a, u_w2a = u
        ju, w_x, w_pos, w_w1a, w_w2a = _cf_hesjvp(
            x_, pos_, w1a, w2a, ct, u_x, u_pos, u_w1a, u_w2a,
            senders, receivers, edge_mask, st, n_node,
            interpret=interpret)
        return ((w_x, w_pos, w_w1a, w_w2a), ju)

    BWD.defvjp(BWD_fwd, BWD_bwd)

    def CF_bwd(res, ct):
        return BWD(res, ct)

    CF.defvjp(CF_fwd, CF_bwd)
    return CF(x, pos, w1a0, w2a0)


def fused_chain_ineligibility(batch, bins: int) -> list:
    """Why this batch/config cannot take the fused-chain kernels
    (empty list = eligible). Mirrors the ACSF gates."""
    import jax as _jax
    reasons = []
    if batch.part_axis is not None:
        reasons.append("edge-partitioned batch")
    if "range_image" in batch.edges:
        reasons.append("periodic batch (range_image shifts)")
    if _jax.default_backend() != "tpu" and not FORCE_INTERPRET:
        reasons.append("non-TPU backend")
    if not batch.edge_window_local:
        reasons.append("edge index locality > 128 (node window cannot "
                       "cover the senders)")
    if bins + 1 > 128:
        reasons.append(f"bins={bins} > 127")
    return reasons
