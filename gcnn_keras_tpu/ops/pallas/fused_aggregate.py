"""Pallas TPU kernel: FUSED gather -> multiply -> segment-sum.

The cfconv hot chain ``out[r] = sum_e x[send[e]] * filt[e]`` (reference
surface: ``kgcnn/layers/gather.py:83`` + ``kgcnn/layers/pooling.py:37-79``)
costs XLA three E x F round-trips to HBM (gather materialized, multiply
fusion, scatter read). This kernel keeps everything on-chip:

- CSR row-block layout like ``segment_sum.py``: receiver-sorted edges give
  each 128-row output block a contiguous edge range (scalar-prefetched
  offsets), accumulated in a VMEM f32 scratch;
- the GATHER rides the batching invariant: senders of a block's edges live
  in the graphs overlapping that block, i.e. within ``max_nodes`` rows of
  the block — so one (W, F) node window DMA'd per block covers every
  sender, and the gather is a (E_BLK, W) one-hot matmul on the MXU (no
  E x F HBM materialization at all);
- the filter chunks stream HBM -> VMEM double-buffered and are multiplied
  in-register before the receiver one-hot accumulate.

Bytes per call drop from ~4 E F (XLA: gather write+read, filt read, scatter
read) to ~E F (filt read) + 3 N F — measured 1.9x on the cfconv chain and
1.16x end-to-end on the SchNet energy+force train step (PERF.md r2).

AD: the op is bilinear in (x, filt). custom_vjp with a plain-JAX backward
(gather/scatter) keeps reverse-over-reverse (force training) working: the
backward graph is ordinary differentiable JAX.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .segment_sum import onehot_dot

Array = jax.Array

N_BLK = 128
E_BLK = 1024


def _onehot_dot_t(onehot_t: Array, mat: Array, exact: bool) -> Array:
    """(K, E)^T-style contraction over the FIRST axis of both operands:
    returns (E, F) = onehot_t^T @ mat. Same bf16-split pass economics as
    ``segment_sum.onehot_dot`` (one-hot side exact in bf16)."""
    dims = (((0,), (0,)), ((), ()))
    if exact:
        return jax.lax.dot_general(
            onehot_t, mat, dims, precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)
    oh = onehot_t.astype(jnp.bfloat16)
    hi = mat.astype(jnp.bfloat16)
    lo = (mat - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    out = jax.lax.dot_general(oh, hi, dims,
                              preferred_element_type=jnp.float32)
    return out + jax.lax.dot_general(oh, lo, dims,
                                     preferred_element_type=jnp.float32)


def _make_kernel(w_win: int, n_pad: int, m_pad: int, exact: bool):
    def kernel(off_ref, recv_hbm, send_hbm, filt_hbm, x_hbm, out_ref,
               acc, xwin, fscr, sscr, rscr, sems, xsem):
        i = pl.program_id(0)
        e0 = off_ref[i]
        e1 = off_ref[i + 1]
        start = (e0 // E_BLK) * E_BLK
        num_chunks = jax.lax.max(((e1 + E_BLK - 1 - start) // E_BLK), 0)

        # sender window: [s_lo, s_lo + W) covers every sender of this
        # block's edges (graphs overlapping the block span < max_nodes rows
        # past either boundary); 8-row aligned by construction
        s_lo = jax.lax.clamp(0, i * N_BLK - m_pad, n_pad - w_win)
        xdma = pltpu.make_async_copy(
            x_hbm.at[pl.ds(s_lo, w_win), :], xwin, xsem)
        xdma.start()

        acc[...] = jnp.zeros_like(acc)

        row_base = i * N_BLK
        row_ids = jax.lax.broadcasted_iota(
            jnp.int32, (N_BLK, E_BLK), 0) + row_base
        # gather one-hot built transposed (W on sublanes) so the comparand
        # (1, E_BLK) broadcasts along lanes
        col_ids = jax.lax.broadcasted_iota(jnp.int32, (w_win, E_BLK), 0)

        def get_dmas(slot, chunk):
            e_start = start + chunk * E_BLK
            df = pltpu.make_async_copy(
                filt_hbm.at[pl.ds(e_start, E_BLK), :], fscr.at[slot],
                sems.at[slot, 0])
            ds = pltpu.make_async_copy(
                send_hbm.at[:, pl.ds(e_start, E_BLK)], sscr.at[slot],
                sems.at[slot, 1])
            dr = pltpu.make_async_copy(
                recv_hbm.at[:, pl.ds(e_start, E_BLK)], rscr.at[slot],
                sems.at[slot, 2])
            return df, ds, dr

        @pl.when(num_chunks > 0)
        def _():
            for d in get_dmas(0, 0):
                d.start()

        xdma.wait()

        def body(chunk, _):
            slot = chunk % 2
            nxt = (chunk + 1) % 2

            @pl.when(chunk + 1 < num_chunks)
            def _():
                for d in get_dmas(nxt, chunk + 1):
                    d.start()

            for d in get_dmas(slot, chunk):
                d.wait()

            send_rel = sscr[slot] - s_lo              # (1, E_BLK)
            # (W, E_BLK) one-hot of sender-within-window
            onehot_g = (col_ids == send_rel).astype(jnp.float32)
            # xj (E_BLK, F) = onehot_g^T @ xwin  — contraction over W
            xj = _onehot_dot_t(onehot_g, xwin[...], exact)
            prod = xj * fscr[slot]
            onehot_r = (rscr[slot] == row_ids).astype(jnp.float32)
            acc[...] += onehot_dot(onehot_r, prod, exact)
            return ()

        jax.lax.fori_loop(0, num_chunks, body, (), unroll=False)
        out_ref[...] = acc[...].astype(out_ref.dtype)

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("num_segments", "max_nodes", "interpret",
                                    "exact"))
def _fused_gather_mul_segsum(x: Array, filt: Array, senders: Array,
                             receivers: Array, num_segments: int,
                             max_nodes: int, interpret: bool = False,
                             exact: bool = False) -> Array:
    e, f_in = filt.shape
    n_in = x.shape[0]
    n_pad = ((max(num_segments, n_in) + N_BLK - 1) // N_BLK) * N_BLK
    e_pad = ((e + E_BLK - 1) // E_BLK) * E_BLK
    f = ((f_in + 127) // 128) * 128

    if x.shape[0] != n_pad or f != f_in:
        x = jnp.pad(x, ((0, n_pad - n_in), (0, f - f_in)))
    if e_pad != e or f != f_in:
        filt = jnp.pad(filt, ((0, e_pad - e), (0, f - f_in)))
        senders = jnp.pad(senders, (0, e_pad - e))
        receivers = jnp.pad(receivers, (0, e_pad - e),
                            constant_values=jnp.int32(n_pad))
    send = senders.astype(jnp.int32)
    recv = receivers.astype(jnp.int32)

    # 8-row-aligned margin so the window DMA start stays sublane-aligned
    m_pad = ((max_nodes + 7) // 8) * 8
    w_win = min(((N_BLK + 2 * m_pad + 127) // 128) * 128, n_pad)

    bounds = jnp.arange(0, n_pad + 1, N_BLK, dtype=jnp.int32)
    offsets = jnp.searchsorted(recv, bounds, side="left").astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_pad // N_BLK,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # receivers (1, E)
            pl.BlockSpec(memory_space=pltpu.ANY),  # senders (1, E)
            pl.BlockSpec(memory_space=pltpu.ANY),  # filt (E, F)
            pl.BlockSpec(memory_space=pltpu.ANY),  # x (N_pad, F)
        ],
        out_specs=pl.BlockSpec((N_BLK, f), lambda i, off: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((N_BLK, f), jnp.float32),       # accumulator
            pltpu.VMEM((w_win, f), x.dtype),           # sender window
            pltpu.VMEM((2, E_BLK, f), filt.dtype),     # filter chunks
            pltpu.VMEM((2, 1, E_BLK), jnp.int32),      # sender chunks
            pltpu.VMEM((2, 1, E_BLK), jnp.int32),      # receiver chunks
            pltpu.SemaphoreType.DMA((2, 3)),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    out = pl.pallas_call(
        _make_kernel(w_win, n_pad, m_pad, exact),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, f), filt.dtype),
        interpret=interpret,
    )(offsets, recv[None, :], send[None, :], filt, x)
    return out[:num_segments, :f_in]


def fused_gather_mul_segsum(x: Array, filt: Array, senders: Array,
                            receivers: Array, num_segments: int,
                            max_nodes: int, interpret: bool = False,
                            exact: bool = False,
                            sender_perm: Optional[Array] = None) -> Array:
    """``out[r] = sum_{e: recv[e]=r} x[send[e]] * filt[e]`` for
    RECEIVER-SORTED edges whose graphs are node-contiguous (the GraphBatch
    invariant). Bilinear custom_vjp: backward is plain differentiable JAX,
    so reverse-over-reverse (force-loss training) works.

    ``sender_perm`` (E,) — build-time stable argsort of senders
    (``batch.edges['sender_perm']``): routes the backward's d_x through the
    SORTED Pallas segment-sum instead of XLA's serialized scatter-add."""

    @jax.custom_vjp
    def f(x, filt):
        return _fused_gather_mul_segsum(x, filt, senders, receivers,
                                        num_segments, max_nodes,
                                        interpret=interpret, exact=exact)

    def f_fwd(x, filt):
        return f(x, filt), (x, filt)

    def f_bwd(res, ct):
        x, filt = res
        ct_e = jnp.take(ct, receivers, axis=0, mode="clip")
        d_filt = jnp.take(x, senders, axis=0, mode="clip") * ct_e
        vals = ct_e * filt
        if sender_perm is not None and not interpret \
                and jax.default_backend() == "tpu":
            from .segment_sum import sorted_segment_sum_pallas
            d_x = sorted_segment_sum_pallas(
                jnp.take(vals, sender_perm, axis=0),
                jnp.take(senders, sender_perm, axis=0).astype(jnp.int32),
                x.shape[0], exact=exact)
        else:
            d_x = jax.ops.segment_sum(vals, senders, x.shape[0],
                                      indices_are_sorted=False)
        return d_x.astype(x.dtype), d_filt.astype(filt.dtype)

    f.defvjp(f_fwd, f_bwd)
    return f(x, filt)


def gather_with_sorted_transpose(values: Array, indices: Array,
                                 sender_perm: Optional[Array] = None,
                                 min_edges: int = 16384) -> Array:
    """``values[(N, ...)][indices (E,)]`` whose TRANSPOSE (the scatter-add
    that dominates every message-passing backward) runs as the sorted
    Pallas segment-sum instead of XLA's serialized scatter.

    ``sender_perm``: build-time stable argsort of ``indices``
    (``batch.edges['sender_perm']``); pass None when ``indices`` is ALREADY
    sorted (receiver gathers under the batching invariant). Trailing dims
    are flattened for the kernel and restored. Gather is linear in
    ``values``, so ``linear_call`` keeps arbitrary-order AD (grad-of-grad
    force training) — the transpose of the transpose is the gather again."""
    from jax.custom_derivatives import linear_call

    use_pallas = (values.ndim >= 2 and values.dtype == jnp.float32
                  and indices.shape[0] >= min_edges
                  and jax.default_backend() == "tpu")
    if not use_pallas:
        return jnp.take(values, indices, axis=0)

    n = values.shape[0]
    trailing = values.shape[1:]
    from .segment_sum import sorted_segment_sum_pallas
    if sender_perm is not None:
        idx_sorted = jnp.take(indices, sender_perm, axis=0).astype(jnp.int32)
    else:
        idx_sorted = indices.astype(jnp.int32)

    # index arrays ride linear_call's residual slot (NOT python closures):
    # closure-captured tracers leak under jax.checkpoint/remat scopes.
    def fwd(res, v):
        idx, _, _ = res
        return jnp.take(v, idx, axis=0)

    def trans(res, ct):
        _, sp, idx_s = res
        ct2 = ct.reshape(ct.shape[0], -1)
        if sp is not None:
            ct2 = jnp.take(ct2, sp, axis=0)
        out = sorted_segment_sum_pallas(ct2, idx_s, n)
        return out.reshape((n,) + trailing)

    return linear_call(fwd, trans, (indices, sender_perm, idx_sorted), values)


def gather_mul_segsum_auto(x: Array, filt: Array, senders: Array,
                           receivers: Array, num_segments: int,
                           max_nodes: Optional[int],
                           indices_are_sorted: bool = False,
                           min_edges: int = 16384,
                           sender_perm: Optional[Array] = None) -> Array:
    """Dispatch: fused Pallas kernel on TPU for large sorted 2-D f32 inputs
    with a known max graph size, else the unfused XLA chain."""
    use_pallas = (
        indices_are_sorted and max_nodes is not None
        and filt.ndim == 2 and x.ndim == 2
        and x.dtype == jnp.float32 and filt.dtype == jnp.float32
        and filt.shape[0] >= min_edges
        and jax.default_backend() == "tpu"
    )
    if use_pallas:
        return fused_gather_mul_segsum(x, filt, senders, receivers,
                                       num_segments, max_nodes,
                                       sender_perm=sender_perm)
    from ..segment import segment_sum
    xj = jnp.take(x, senders, axis=0)
    return segment_sum(xj * filt, receivers, num_segments,
                       indices_are_sorted=indices_are_sorted)
