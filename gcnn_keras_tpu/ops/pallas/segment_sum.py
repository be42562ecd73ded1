"""Pallas TPU kernel: segment-sum over receiver-sorted edges as blocked
one-hot matmuls on the MXU.

This is THE aggregation kernel of the framework (reference counterpart:
``tf.math.segment_sum`` after per-call argsort, ``kgcnn/layers/pooling.py:66``).
XLA lowers ``segment_sum`` to a scatter-add, which serializes on duplicate
indices on TPU. Because GraphBatch sorts edges by receiver once at build
time, each 128-row output block owns a *contiguous* edge range, so the sum
can be computed as ``onehot(recv) @ values`` per block — a (128, E_BLK) x
(E_BLK, F) matmul that runs on the systolic array instead of the scalar
scatter path.

Layout: CSR-style row-block kernel with scalar-prefetched per-block edge
offsets; edge chunks are DMA'd HBM -> VMEM double-buffered and accumulated
in a VMEM f32 scratch.

Precision/pass economics: the one-hot factor is EXACTLY representable in
bf16, so the f32 matmul never needs the compiler's 6-pass f32 emulation
(Precision.HIGHEST) — a 2-term bf16 split of the values (hi = bf16(v),
lo = bf16(v - hi)) recovers ~16 mantissa bits in TWO native bf16 MXU
passes: out = onehot_bf16 @ hi + onehot_bf16 @ lo. Measured on v5e this is
~2.4x faster than HIGHEST at ~1e-5 relative error (vs ~2e-2 for XLA's
default bf16 truncation). ``exact=True`` keeps the old HIGHEST path.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

# Block sizes are overridable via env for FULL-STEP A/B runs (bench.py /
# train entry points call through the default kwargs; the sweep tool
# tools/sweep_segsum_blocks.py passes n_blk/e_blk explicitly instead).
# Defaults are the best full-step measurement on v5e.
import os as _os


def _env_block(name: str, default: int, multiple: int) -> int:
    raw = _os.environ.get(name)
    if raw is None:
        return default
    try:
        val = int(raw)
    except ValueError:
        raise ValueError(f"{name}={raw!r} is not an integer") from None
    if val <= 0 or val % multiple != 0:
        raise ValueError(
            f"{name}={val} invalid: must be a positive multiple of "
            f"{multiple} (v5e DMA/MXU tiling constraint)")
    return val


# E_BLK: HBM->VMEM DMA slices need 128-aligned extents; N_BLK: output row
# blocks must tile the f32 (8, 128) layout (128 keeps the MXU fully fed).
N_BLK = _env_block("GCNN_SEGSUM_N_BLK", 128, 8)
E_BLK = _env_block("GCNN_SEGSUM_E_BLK", 1024, 128)
# Kernel variant for full-step A/B: v1 (per-block chunk loop, default),
# v3 (receivers resident in VMEM + `slots`-deep DMA ring).
IMPL = _os.environ.get("GCNN_SEGSUM_IMPL", "v1")
SLOTS = _env_block("GCNN_SEGSUM_SLOTS", 2, 1)
if IMPL not in ("v1", "v2", "v3"):
    raise ValueError(f"GCNN_SEGSUM_IMPL={IMPL!r} invalid: use v1|v2|v3")


def onehot_dot(onehot: Array, vals: Array, exact: bool) -> Array:
    """(R, E) 0/1 one-hot @ (E, F) f32 values -> (R, F) f32.

    ``exact=False``: 2-term bf16 split (see module docstring) — 2 native
    MXU passes, ~1e-5 relative. ``exact=True``: Precision.HIGHEST.
    """
    dims = (((1,), (0,)), ((), ()))
    if exact:
        return jax.lax.dot_general(
            onehot, vals, dims, precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)
    oh = onehot.astype(jnp.bfloat16)
    hi = vals.astype(jnp.bfloat16)
    lo = (vals - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    out = jax.lax.dot_general(oh, hi, dims,
                              preferred_element_type=jnp.float32)
    return out + jax.lax.dot_general(oh, lo, dims,
                                     preferred_element_type=jnp.float32)


def _make_kernel(exact: bool, n_blk: int, e_blk: int):
    def _kernel(off_ref, recv_hbm, val_hbm, out_ref, acc, vscr, rscr, sems):
        i = pl.program_id(0)
        e0 = off_ref[i]
        e1 = off_ref[i + 1]
        # chunk-align the start so DMA offsets are multiples of e_blk
        start = (e0 // e_blk) * e_blk
        num_chunks = jax.lax.max(((e1 + e_blk - 1 - start) // e_blk), 0)

        acc[...] = jnp.zeros_like(acc)

        row_base = i * n_blk
        row_ids = jax.lax.broadcasted_iota(
            jnp.int32, (n_blk, e_blk), 0) + row_base

        def get_dmas(slot, chunk):
            e_start = start + chunk * e_blk
            dv = pltpu.make_async_copy(
                val_hbm.at[pl.ds(e_start, e_blk), :], vscr.at[slot],
                sems.at[slot, 0])
            dr = pltpu.make_async_copy(
                recv_hbm.at[:, pl.ds(e_start, e_blk)], rscr.at[slot],
                sems.at[slot, 1])
            return dv, dr

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

            recv = rscr[slot]  # (1, E_BLK) int32
            vals = vscr[slot]  # (E_BLK, F)
            onehot = (recv == row_ids).astype(vals.dtype)  # (N_BLK, E_BLK)
            acc[...] += onehot_dot(onehot, vals, exact)
            return ()

        jax.lax.fori_loop(0, num_chunks, body, (), unroll=False)
        out_ref[...] = acc[...].astype(out_ref.dtype)

    return _kernel


@functools.partial(jax.jit, static_argnames=("num_segments", "exact",
                                              "n_blk", "e_blk"))
def _sorted_segment_sum_pallas(values: Array, receivers: Array,
                               num_segments: int,
                               exact: bool = False,
                               n_blk: int = N_BLK,
                               e_blk: int = E_BLK) -> Array:
    e, f_in = values.shape
    n_pad = ((num_segments + n_blk - 1) // n_blk) * n_blk
    e_pad = ((e + e_blk - 1) // e_blk) * e_blk
    # lane tiling: HBM->VMEM DMA slices need a 128-aligned feature dim
    f = ((f_in + 127) // 128) * 128
    if e_pad != e or f != f_in:
        values = jnp.pad(values, ((0, e_pad - e), (0, f - f_in)))
        receivers = jnp.pad(receivers, (0, e_pad - e),
                            constant_values=jnp.int32(n_pad))
    recv = receivers.astype(jnp.int32)
    # per-node-block edge ranges (host-free, one vectorized searchsorted)
    bounds = jnp.arange(0, n_pad + 1, n_blk, dtype=jnp.int32)
    offsets = jnp.searchsorted(recv, bounds, side="left").astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_pad // n_blk,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # receivers (1, E) in HBM
            pl.BlockSpec(memory_space=pltpu.ANY),  # values (E, F) in HBM
        ],
        out_specs=pl.BlockSpec((n_blk, f), lambda i, off: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((n_blk, f), jnp.float32),       # accumulator
            pltpu.VMEM((2, e_blk, f), values.dtype),   # value chunks
            pltpu.VMEM((2, 1, e_blk), jnp.int32),      # receiver chunks
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    out = pl.pallas_call(
        _make_kernel(exact, n_blk, e_blk),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, f), values.dtype),
    )(offsets, recv[None, :], values)
    return out[:num_segments, :f_in]


def _make_kernel_v2(exact: bool, n_blk: int, e_blk: int, total_chunks: int):
    """Cross-block pipelined variant: DMA slots PERSIST across grid steps
    (the TPU grid is sequential), chunks are indexed globally, and each
    block prefetches the next global chunk while computing — so block
    boundaries neither stall on the first DMA nor refetch the shared
    boundary chunk. SMEM bookkeeping: started[slot]/waited[slot] = global
    chunk id most recently DMA'd / waited into that slot."""

    def _kernel(off_ref, recv_hbm, val_hbm, out_ref, acc, vscr, rscr,
                started, waited, sems):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            started[0] = -1
            started[1] = -1
            waited[0] = -1
            waited[1] = -1

        e0 = off_ref[i]
        e1 = off_ref[i + 1]
        c0 = e0 // e_blk
        c1 = jax.lax.select(e1 > e0, (e1 + e_blk - 1) // e_blk, c0)

        acc[...] = jnp.zeros_like(acc)
        row_base = i * n_blk
        row_ids = jax.lax.broadcasted_iota(
            jnp.int32, (n_blk, e_blk), 0) + row_base

        def get_dmas(slot, chunk):
            e_start = chunk * e_blk
            dv = pltpu.make_async_copy(
                val_hbm.at[pl.ds(e_start, e_blk), :], vscr.at[slot],
                sems.at[slot, 0])
            dr = pltpu.make_async_copy(
                recv_hbm.at[:, pl.ds(e_start, e_blk)], rscr.at[slot],
                sems.at[slot, 1])
            return dv, dr

        def ensure_started(slot, chunk):
            @pl.when(started[slot] != chunk)
            def _():
                for d in get_dmas(slot, chunk):
                    d.start()
                started[slot] = chunk

        def ensure_waited(slot, chunk):
            @pl.when(waited[slot] != chunk)
            def _():
                for d in get_dmas(slot, chunk):
                    d.wait()
                waited[slot] = chunk

        @pl.when(c1 > c0)
        def _():
            ensure_started(c0 % 2, c0)

        def body(k, _):
            slot = k % 2
            nxt = (k + 1) % 2

            # prefetch the next GLOBAL chunk (may belong to a later block)
            @pl.when(k + 1 < total_chunks)
            def _():
                ensure_started(nxt, k + 1)

            ensure_waited(slot, k)

            recv = rscr[slot]
            vals = vscr[slot]
            onehot = (recv == row_ids).astype(vals.dtype)
            acc[...] += onehot_dot(onehot, vals, exact)
            return ()

        jax.lax.fori_loop(c0, c1, body, (), unroll=False)
        out_ref[...] = acc[...].astype(out_ref.dtype)

    return _kernel


@functools.partial(jax.jit, static_argnames=("num_segments", "exact",
                                              "n_blk", "e_blk", "interpret"))
def _sorted_segment_sum_pallas_v2(values: Array, receivers: Array,
                                  num_segments: int,
                                  exact: bool = False,
                                  n_blk: int = N_BLK,
                                  e_blk: int = E_BLK,
                                  interpret: bool = False) -> Array:
    e, f_in = values.shape
    n_pad = ((num_segments + n_blk - 1) // n_blk) * n_blk
    e_pad = ((e + e_blk - 1) // e_blk) * e_blk
    f = ((f_in + 127) // 128) * 128
    if e_pad != e or f != f_in:
        values = jnp.pad(values, ((0, e_pad - e), (0, f - f_in)))
        receivers = jnp.pad(receivers, (0, e_pad - e),
                            constant_values=jnp.int32(n_pad))
    recv = receivers.astype(jnp.int32)
    bounds = jnp.arange(0, n_pad + 1, n_blk, dtype=jnp.int32)
    offsets = jnp.searchsorted(recv, bounds, side="left").astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_pad // n_blk,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((n_blk, f), lambda i, off: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((n_blk, f), jnp.float32),
            pltpu.VMEM((2, e_blk, f), values.dtype),
            pltpu.VMEM((2, 1, e_blk), jnp.int32),
            pltpu.SMEM((2,), jnp.int32),   # started
            pltpu.SMEM((2,), jnp.int32),   # waited
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    out = pl.pallas_call(
        _make_kernel_v2(exact, n_blk, e_blk, e_pad // e_blk),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, f), values.dtype),
        interpret=interpret,
    )(offsets, recv[None, :], values)
    return out[:num_segments, :f_in]


def _make_kernel_v3(exact: bool, n_blk: int, e_blk: int, slots: int):
    """v3: the receiver ids for the WHOLE batch live in VMEM (E x 4 bytes —
    219 KB even at the 512-molecule bench shapes), so each chunk iteration
    issues ONE value DMA instead of two, and the DMA ring is ``slots`` deep
    (prefetch depth ``slots - 1``) to hide issue/semaphore latency — the
    measured ~5-7 us/chunk fixed cost that bounds v1/v2 (PERF.md r2/r3)."""

    def _kernel(off_ref, recv_vmem, val_hbm, out_ref, acc, vscr, sems):
        i = pl.program_id(0)
        e0 = off_ref[i]
        e1 = off_ref[i + 1]
        start = (e0 // e_blk) * e_blk
        num_chunks = jax.lax.max(((e1 + e_blk - 1 - start) // e_blk), 0)

        acc[...] = jnp.zeros_like(acc)
        row_base = i * n_blk
        row_ids = jax.lax.broadcasted_iota(
            jnp.int32, (n_blk, e_blk), 0) + row_base

        def dma(slot, chunk):
            e_start = start + chunk * e_blk
            return pltpu.make_async_copy(
                val_hbm.at[pl.ds(e_start, e_blk), :], vscr.at[slot],
                sems.at[slot])

        # warm the ring: start the first `slots` chunk DMAs back-to-back
        for p in range(slots):
            @pl.when(p < num_chunks)
            def _():
                dma(p, p).start()

        def body(chunk, _):
            slot = chunk % slots

            dma(slot, chunk).wait()
            e_start = start + chunk * e_blk
            recv = recv_vmem[:, pl.ds(e_start, e_blk)]
            vals = vscr[slot]
            onehot = (recv == row_ids).astype(vals.dtype)
            acc[...] += onehot_dot(onehot, vals, exact)

            # refill this slot with the chunk `slots` ahead
            @pl.when(chunk + slots < num_chunks)
            def _():
                dma(slot, chunk + slots).start()
            return ()

        jax.lax.fori_loop(0, num_chunks, body, (), unroll=False)
        out_ref[...] = acc[...].astype(out_ref.dtype)

    return _kernel


@functools.partial(jax.jit, static_argnames=("num_segments", "exact",
                                              "n_blk", "e_blk", "slots"))
def _sorted_segment_sum_pallas_v3(values: Array, receivers: Array,
                                  num_segments: int,
                                  exact: bool = False,
                                  n_blk: int = N_BLK,
                                  e_blk: int = E_BLK,
                                  slots: int = 2) -> Array:
    e, f_in = values.shape
    n_pad = ((num_segments + n_blk - 1) // n_blk) * n_blk
    e_pad = ((e + e_blk - 1) // e_blk) * e_blk
    f = ((f_in + 127) // 128) * 128
    if e_pad != e or f != f_in:
        values = jnp.pad(values, ((0, e_pad - e), (0, f - f_in)))
        receivers = jnp.pad(receivers, (0, e_pad - e),
                            constant_values=jnp.int32(n_pad))
    recv = receivers.astype(jnp.int32)
    bounds = jnp.arange(0, n_pad + 1, n_blk, dtype=jnp.int32)
    offsets = jnp.searchsorted(recv, bounds, side="left").astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_pad // n_blk,),
        in_specs=[
            # whole receiver array resident in VMEM for the whole call
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),   # values stay in HBM
        ],
        out_specs=pl.BlockSpec((n_blk, f), lambda i, off: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((n_blk, f), jnp.float32),
            pltpu.VMEM((slots, e_blk, f), values.dtype),
            pltpu.SemaphoreType.DMA((slots,)),
        ],
    )
    out = pl.pallas_call(
        _make_kernel_v3(exact, n_blk, e_blk, slots),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, f), values.dtype),
    )(offsets, recv[None, :], values)
    return out[:num_segments, :f_in]


def sorted_segment_sum_pallas(values: Array, receivers: Array,
                              num_segments: int,
                              exact: bool = False) -> Array:
    """Segment-sum for RECEIVER-SORTED edges. values (E, F) float,
    receivers (E,) int32 ascending, -> (num_segments, F).

    Segment-sum is LINEAR in ``values``, so derivatives are registered via
    ``linear_call`` with the transpose = gather — this supports
    arbitrary-order autodiff (needed because training losses differentiate
    through forces, i.e. grad-of-grad), which a custom_vjp cannot.
    """
    from jax.custom_derivatives import linear_call

    if IMPL == "v3":
        impl = functools.partial(_sorted_segment_sum_pallas_v3, slots=SLOTS)
    elif IMPL == "v2":
        impl = _sorted_segment_sum_pallas_v2
    else:
        impl = _sorted_segment_sum_pallas

    def fwd(res, vals):
        (recv,) = res
        return impl(vals, recv, num_segments, exact=exact)

    def trans(res, ct):
        (recv,) = res
        return jnp.take(ct, recv, axis=0, mode="clip")

    return linear_call(fwd, trans, (receivers,), values)


def segment_sum_auto(values: Array, receivers: Array, num_segments: int,
                     indices_are_sorted: bool = False) -> Array:
    """Dispatch to the Pallas kernel on TPU for sorted 2-D float inputs,
    else fall back to ``jax.ops.segment_sum``."""
    use_pallas = (
        indices_are_sorted and values.ndim == 2
        and jnp.issubdtype(values.dtype, jnp.floating)
        and jax.default_backend() == "tpu"
    )
    if use_pallas:
        return sorted_segment_sum_pallas(values, receivers, num_segments)
    return jax.ops.segment_sum(values, receivers, num_segments,
                               indices_are_sorted=indices_are_sorted)
