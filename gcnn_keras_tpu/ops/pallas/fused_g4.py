"""Pallas TPU kernels: FULLY fused ACSF G4 angular descriptors.

The G4 chain (``layers/conv/acsf.py:ACSFG4``, reference semantics
``kgcnn/layers/conv/acsf_conv.py:430-510``) is the flagship HDNNP4th's
dominant cost: at bench shapes (100k angle triples, 15 element pairs x 8
sets) the unfused forward+backward takes 5.1 ms of the 11.7 ms train step
(tools/bench_g4.py). XLA materializes every (A, .) intermediate — three
position gathers, distances, transcendental tables, the (A, R*m) one-hot
expansion — in HBM, in EVERY autodiff traversal.

These kernels keep the whole pipeline in VMEM. Two layout decisions carry
the performance:

- windowed one-hot gathers (the ``fused_aggregate.py`` pattern): angles
  are CENTER-SORTED at batch build, so each 128-row output block owns a
  contiguous angle range whose three nodes all live in a 3x128-row node
  window around the block (the batching invariant, ``max_nodes <= 128``)
  — one tiny (8, 384) window DMA per block serves every gather as an MXU
  matmul;
- a TRANSPOSED register layout: the node table is stored as (8, N) — xyz
  on sublanes 0-2, atomic number on sublane 3 — so gathers produce
  (8, A_BLK) registers and ALL per-angle scalar math (distances,
  transcendentals, pair-relation selection) runs on (1, A_BLK) rows at
  FULL 128-lane VPU occupancy. The first (row-major) version of these
  kernels kept per-angle scalars as (A_BLK, 1) columns — each padded to a
  full 128-lane tile, 1/128 occupancy — and measured 2.6x SLOWER than the
  unfused XLA chain; the transposed layout is what makes fusion win.

AD closure with THREE kernels (G4 has no trainable parameters, so every
training traversal is linear in either the position tangent or the
output cotangent):

- ``fwd``:   G = G4(pos)                       (primal)
- ``jvp``:   dG = J(pos) @ dpos                (directional derivative)
- ``vjp``:   dpos = J(pos)^T @ ct              (force reverse pass)

wired as ``custom_jvp`` whose tangent is a ``linear_call(jvp, vjp)``: the
force computation transposes onto the vjp kernel, and the training loss's
second reverse (linear in ct) transposes the vjp back onto the jvp kernel
— all three traversals ride fused kernels, no unfused fallback at any
order the flagship training uses.

Scope (asserted): shared grid-constant parameter tables (the
``make_param_table`` meshgrid every fork config uses), R*m <= 128 output
lanes, m <= 8 sets, max_nodes <= 128, f32, single-device batches
(edge-partitioned shards fall back to the unfused path).
"""
from __future__ import annotations

import functools
import math
from typing import NamedTuple, Sequence

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

N_BLK = 128
A_BLK = 1024
W_WIN = 3 * N_BLK  # lane-aligned node window: block row range +-128


class G4Static(NamedTuple):
    """Static (python) configuration baked into the kernels."""
    uniq_eta: tuple          # Ue floats
    uniq_zl: tuple           # Uzl (zeta, lambda) float pairs
    uniq_rc: tuple           # Urc floats
    eta_inv: tuple           # m ints -> Ue index
    zl_inv: tuple            # m ints -> Uzl index
    rc_inv: tuple            # m ints -> Urc index
    elements: tuple          # atomic numbers (sorted slots)
    keep_pair_order: bool
    num_rel: int             # R (pair relations)
    scale: float             # 1/multiplicity (or 1.0)


def make_static(table: np.ndarray, elements: Sequence[int],
                keep_pair_order: bool, multiplicity) -> G4Static:
    """Factor the (R[, T], m, 4) grid table into unique static values.
    Requires the grid to be identical for every pair slot (the
    make_param_table construction)."""
    grid = table.reshape(-1, table.shape[-2], 4)
    assert bool(np.all(grid == grid[0:1])), \
        "fused G4 requires a shared (grid-constant) parameter table"
    g0 = grid[0]
    uniq_eta, eta_inv = np.unique(g0[:, 0], return_inverse=True)
    uniq_zl, zl_inv = np.unique(g0[:, 1:3], axis=0, return_inverse=True)
    uniq_rc, rc_inv = np.unique(g0[:, 3], return_inverse=True)
    num_el = len(elements)
    num_rel = num_el * num_el if keep_pair_order \
        else num_el * (num_el + 1) // 2
    return G4Static(
        uniq_eta=tuple(float(v) for v in uniq_eta),
        uniq_zl=tuple((float(a), float(b)) for a, b in uniq_zl),
        uniq_rc=tuple(float(v) for v in uniq_rc),
        eta_inv=tuple(int(v) for v in eta_inv),
        zl_inv=tuple(int(v) for v in zl_inv),
        rc_inv=tuple(int(v) for v in rc_inv),
        elements=tuple(int(z) for z in np.asarray(elements)),
        keep_pair_order=bool(keep_pair_order),
        num_rel=int(num_rel),
        scale=1.0 / float(multiplicity) if multiplicity else 1.0)


# ---------------------------------------------------------- kernel math ---
# Everything below operates on TRANSPOSED registers: vectors are
# (8, A_BLK) with xyz on sublanes 0-2, per-angle scalars are (1, A_BLK).

def _sum3(v):
    """Sum of sublanes 0..2 of an (8, B) register -> (1, B)."""
    return v[0:1] + v[1:2] + v[2:3]


def _geometry(pi, pj, pk):
    eps = 1e-12
    vij = pj - pi
    vik = pk - pi
    vjk = pk - pj
    rij = jnp.sqrt(jnp.maximum(_sum3(vij * vij), eps))
    rik = jnp.sqrt(jnp.maximum(_sum3(vik * vik), eps))
    rjk = jnp.sqrt(jnp.maximum(_sum3(vjk * vjk), eps))
    cos = _sum3(vij * vik) / rij / rik
    return vij, vik, vjk, rij, rik, rjk, cos


def _cutoff(r, rc):
    rclip = jnp.clip(r, -rc, rc)
    return 0.5 * (jnp.cos(rclip * (math.pi / rc)) + 1.0)


def _cutoff_d(r, rc):
    """d f_c / d r with the clip semantics (zero outside [-rc, rc])."""
    inside = (jnp.abs(r) <= rc).astype(r.dtype)
    return -0.5 * (math.pi / rc) * jnp.sin(r * (math.pi / rc)) * inside


def _tables(st: G4Static, rij, rik, rjk, cos, with_derivs: bool):
    """Per-angle unique transcendental tables (and their derivatives),
    each a (1, B) row."""
    s2 = rij * rij + rik * rik + rjk * rjk
    e = [jnp.exp(-eta * s2) for eta in st.uniq_eta]
    c, dc = [], []
    for zeta, lam in st.uniq_zl:
        raw = cos * lam + 1.0
        base = jnp.maximum(raw, 1e-30)
        p = (2.0 ** (1.0 - zeta)) * jnp.power(base, zeta)
        c.append(p)
        if with_derivs:
            # match autodiff-through-jnp.maximum: zero derivative on the
            # clamped branch (exactly collinear angles hit raw <= 1e-30)
            live = (raw > 1e-30).astype(cos.dtype)
            dc.append((2.0 ** (1.0 - zeta)) * zeta * lam
                      * jnp.power(base, zeta - 1.0) * live)
    f, df_ij, df_ik, df_jk = [], [], [], []
    for rc in st.uniq_rc:
        fij = _cutoff(rij, rc)
        fik = _cutoff(rik, rc)
        fjk = _cutoff(rjk, rc)
        f.append(fij * fik * fjk)
        if with_derivs:
            df_ij.append(_cutoff_d(rij, rc) * fik * fjk)
            df_ik.append(fij * _cutoff_d(rik, rc) * fjk)
            df_jk.append(fij * fik * _cutoff_d(rjk, rc))
    de = [-eta * ee for eta, ee in zip(st.uniq_eta, e)] if with_derivs else []
    return dict(s2=s2, e=e, c=c, f=f, de=de, dc=dc,
                df_ij=df_ij, df_ik=df_ik, df_jk=df_jk)


def _pair_id(st: G4Static, zj, zk):
    """Pair relation id from gathered atomic numbers ((1, B) f32 rows)."""
    num_el = len(st.elements)
    slot_j = jnp.zeros_like(zj)
    slot_k = jnp.zeros_like(zk)
    for idx, z in enumerate(st.elements):
        slot_j = jnp.where(jnp.abs(zj - z) < 0.5, float(idx), slot_j)
        slot_k = jnp.where(jnp.abs(zk - z) < 0.5, float(idx), slot_k)
    if st.keep_pair_order:
        return slot_j * num_el + slot_k
    a = jnp.minimum(slot_j, slot_k)
    b = jnp.maximum(slot_j, slot_k)
    # id = a*num_el - a(a-1)/2 + (b - a) for sorted unordered pairs
    return a * num_el - a * (a - 1.0) * 0.5 + (b - a)


def _rep_rows(st: G4Static, tabs):
    """(m, B): per-set descriptor rows stacked on sublanes."""
    rows = [tabs["c"][st.zl_inv[s]] * tabs["e"][st.eta_inv[s]]
            * tabs["f"][st.rc_inv[s]] * st.scale
            for s in range(len(st.eta_inv))]
    return jnp.concatenate(rows, axis=0)


def _drep_rows(st: G4Static, tabs, dcos, ds2, drij, drik, drjk):
    """(m, B): tangents of the per-set descriptors."""
    rows = []
    for s in range(len(st.eta_inv)):
        c = tabs["c"][st.zl_inv[s]]
        e = tabs["e"][st.eta_inv[s]]
        f = tabs["f"][st.rc_inv[s]]
        d = (tabs["dc"][st.zl_inv[s]] * e * f * dcos
             + c * tabs["de"][st.eta_inv[s]] * f * ds2
             + c * e * (tabs["df_ij"][st.rc_inv[s]] * drij
                        + tabs["df_ik"][st.rc_inv[s]] * drik
                        + tabs["df_jk"][st.rc_inv[s]] * drjk))
        rows.append(d * st.scale)
    return jnp.concatenate(rows, axis=0)


def _rep_coeffs(st: G4Static, tabs, drep_rows):
    """Adjoint: (m, B) per-set cotangent rows -> the five geometry
    channels (a_cos, a_s2, a_rij, a_rik, a_rjk), each (1, B)."""
    zero = jnp.zeros_like(tabs["s2"])
    a_cos = a_s2 = a_rij = a_rik = a_rjk = zero
    for s in range(len(st.eta_inv)):
        ct = drep_rows[s:s + 1] * st.scale
        c = tabs["c"][st.zl_inv[s]]
        e = tabs["e"][st.eta_inv[s]]
        f = tabs["f"][st.rc_inv[s]]
        a_cos = a_cos + ct * tabs["dc"][st.zl_inv[s]] * e * f
        a_s2 = a_s2 + ct * c * tabs["de"][st.eta_inv[s]] * f
        a_rij = a_rij + ct * c * e * tabs["df_ij"][st.rc_inv[s]]
        a_rik = a_rik + ct * c * e * tabs["df_ik"][st.rc_inv[s]]
        a_rjk = a_rjk + ct * c * e * tabs["df_jk"][st.rc_inv[s]]
    return a_cos, a_s2, a_rij, a_rik, a_rjk


def _dv_from_coeffs(a_cos, a_s2, a_rij, a_rik, a_rjk,
                    vij, vik, vjk, rij, rik, rjk, cos):
    """Geometry-channel cotangents -> (d_vij, d_vik, d_vjk), (8, B)."""
    inv_ij = 1.0 / rij
    inv_ik = 1.0 / rik
    inv_jk = 1.0 / rjk
    d_vij = (a_cos * (vik * (inv_ij * inv_ik) - vij * (cos * inv_ij * inv_ij))
             + a_s2 * 2.0 * vij + a_rij * vij * inv_ij)
    d_vik = (a_cos * (vij * (inv_ij * inv_ik) - vik * (cos * inv_ik * inv_ik))
             + a_s2 * 2.0 * vik + a_rik * vik * inv_ik)
    d_vjk = a_s2 * 2.0 * vjk + a_rjk * vjk * inv_jk
    return d_vij, d_vik, d_vjk


def _dot_nt(a: Array, b: Array) -> Array:
    """a (M, K) @ b (N, K)^T -> (M, N) with the 2-term bf16 split on ``b``
    (``a`` is an exact 0/1 one-hot product; same pass economics as
    segment_sum.onehot_dot)."""
    dims = (((1,), (1,)), ((), ()))
    ab = a.astype(jnp.bfloat16)
    hi = b.astype(jnp.bfloat16)
    lo = (b - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    out = jax.lax.dot_general(ab, hi, dims,
                              preferred_element_type=jnp.float32)
    return out + jax.lax.dot_general(ab, lo, dims,
                                     preferred_element_type=jnp.float32)


def _gather_t(xwin_t: Array, oh: Array) -> Array:
    """(8, W) node window gathered by a (W, B) one-hot -> (8, B).

    3-term bf16 split on the positions (hi + mid + lo recovers ~24
    mantissa bits): one-hot side exact in bf16, so three native MXU
    passes reproduce the f32 positions to ~2^-24 relative — half the
    passes of Precision.HIGHEST, which dominated the first on-chip
    measurement of these kernels."""
    dims = (((1,), (0,)), ((), ()))
    ohb = oh.astype(jnp.bfloat16)
    hi = xwin_t.astype(jnp.bfloat16)
    r1 = xwin_t - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    out = jax.lax.dot_general(hi, ohb, dims,
                              preferred_element_type=jnp.float32)
    out = out + jax.lax.dot_general(mid, ohb, dims,
                                    preferred_element_type=jnp.float32)
    return out + jax.lax.dot_general(lo, ohb, dims,
                                     preferred_element_type=jnp.float32)


def _rel_pad(num_rel: int) -> int:
    """Relation rows padded to the 8-sublane tile (any R <= 128 works)."""
    return ((num_rel + 7) // 8) * 8


def _expand_mats(num_rel: int, m: int, dtype=jnp.float32):
    """Iota-built expansion selectors: M1 (128, 8) picks set L % m onto
    lane L; M2 (128, R_pad) picks relation L // m onto lane L (for lanes
    L < R*m). Mosaic constant-folds both."""
    n_used = num_rel * m
    r_pad = _rel_pad(num_rel)
    lane = jax.lax.broadcasted_iota(jnp.int32, (128, 8), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (128, 8), 1)
    m1 = ((lane % m == col) & (lane < n_used) & (col < m)).astype(dtype)
    lane2 = jax.lax.broadcasted_iota(jnp.int32, (128, r_pad), 0)
    col2 = jax.lax.broadcasted_iota(jnp.int32, (128, r_pad), 1)
    m2 = ((lane2 // m == col2) & (lane2 < n_used)
          & (col2 < num_rel)).astype(dtype)
    return m1, m2


def _sel_rows(num_rel: int, rel_id):
    """(R_pad, B): row r = [rel_id == r] (padded to the sublane tile)."""
    rows = [(jnp.abs(rel_id - r) < 0.5).astype(jnp.float32)
            for r in range(num_rel)]
    rows += [jnp.zeros_like(rel_id)] * (_rel_pad(num_rel) - num_rel)
    return jnp.concatenate(rows, axis=0)


def _rep_exp_t(num_rel: int, m: int, rep_rows, sel_rows):
    """(128, B) transposed lane expansion: row L = rep_{L%m} * sel_{L//m}
    — two tiny constant matmuls instead of R per-relation matmuls (the
    per-relation form wasted 15/16 of the MXU on 8-lane outputs)."""
    m1, m2 = _expand_mats(num_rel, m)
    rep8 = jnp.pad(rep_rows, ((0, 8 - rep_rows.shape[0]), (0, 0)))
    a = jax.lax.dot_general(m1, rep8, (((1,), (0,)), ((), ())),
                            precision=jax.lax.Precision.HIGHEST,
                            preferred_element_type=jnp.float32)
    b = jax.lax.dot_general(m2, sel_rows, (((1,), (0,)), ((), ())),
                            precision=jax.lax.Precision.HIGHEST,
                            preferred_element_type=jnp.float32)
    return a * b


def _pool_rel(num_rel: int, m: int, oh_recv, rep_rows, rel_id, f_pad):
    """(N_BLK, f_pad) block contribution: ONE full-width matmul of the
    receiver one-hot against the transposed lane expansion."""
    rep_exp_t = _rep_exp_t(num_rel, m, rep_rows, _sel_rows(num_rel, rel_id))
    return _dot_nt(oh_recv, rep_exp_t)


def _unpool_rel(num_rel: int, m: int, oh_recv, ct_blk, rel_id):
    """Adjoint of ``_pool_rel``: (N_BLK, f_pad) block cotangent ->
    (m, B) per-angle descriptor cotangent rows. Mirror structure:
    gather the per-angle expanded cotangent with one full-width matmul,
    then fold lanes back through the constant selectors."""
    # (128, B): per-angle cotangent of the expanded lanes
    dims = (((0,), (0,)), ((), ()))
    ohb = oh_recv.astype(jnp.bfloat16)
    hi = ct_blk.astype(jnp.bfloat16)
    lo = (ct_blk - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    dexp = jax.lax.dot_general(hi, ohb, dims,
                               preferred_element_type=jnp.float32)
    dexp = dexp + jax.lax.dot_general(lo, ohb, dims,
                                      preferred_element_type=jnp.float32)
    m1, m2 = _expand_mats(num_rel, m)
    sel = _sel_rows(num_rel, rel_id)
    bsel = jax.lax.dot_general(m2, sel, (((1,), (0,)), ((), ())),
                               precision=jax.lax.Precision.HIGHEST,
                               preferred_element_type=jnp.float32)
    folded = jax.lax.dot_general(                         # (8, B)
        m1, dexp * bsel, (((0,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)
    return folded[:m]


def _row_mask3(x):
    """Zero all sublanes except 0..2 of an (8, B) register."""
    rows = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    return jnp.where(rows < 3, x, 0.0)


# ------------------------------------------------------------- kernels ---

def _block_window(i, n_pad):
    """Lane-aligned node window start for block i (the multiple_of hint
    lets Mosaic prove the 128-lane DMA alignment through the clamp)."""
    return pl.multiple_of(jax.lax.clamp(0, (i - 1) * N_BLK, n_pad - W_WIN),
                          N_BLK)


def _make_fwd_kernel(st: G4Static, n_pad: int, f_pad: int):
    def kernel(off_ref, ids_hbm, x_hbm, out_ref, acc, xwin, iscr, sems,
               xsem):
        i = pl.program_id(0)
        e0 = off_ref[i]
        e1 = off_ref[i + 1]
        start = (e0 // A_BLK) * A_BLK
        num_chunks = jax.lax.max(((e1 + A_BLK - 1 - start) // A_BLK), 0)

        s_lo = _block_window(i, n_pad)
        pltpu.make_async_copy(x_hbm.at[:, pl.ds(s_lo, W_WIN)], xwin,
                              xsem).start()
        acc[...] = jnp.zeros_like(acc)

        row_ids = jax.lax.broadcasted_iota(
            jnp.int32, (N_BLK, A_BLK), 0) + i * N_BLK
        win_ids = jax.lax.broadcasted_iota(
            jnp.int32, (W_WIN, A_BLK), 0) + s_lo

        def dma(slot, chunk):
            a0 = start + chunk * A_BLK
            return pltpu.make_async_copy(
                ids_hbm.at[:, pl.ds(a0, A_BLK)], iscr.at[slot],
                sems.at[slot])

        @pl.when(num_chunks > 0)
        def _():
            dma(0, 0).start()

        pltpu.make_async_copy(x_hbm.at[:, pl.ds(s_lo, W_WIN)], xwin,
                              xsem).wait()

        def body(chunk, _):
            slot = chunk % 2

            @pl.when(chunk + 1 < num_chunks)
            def _():
                dma((chunk + 1) % 2, chunk + 1).start()

            dma(slot, chunk).wait()
            ids = iscr[slot]                       # (4, A_BLK) int32
            oh_i = (ids[0:1] == win_ids).astype(jnp.float32)
            oh_j = (ids[1:2] == win_ids).astype(jnp.float32)
            oh_k = (ids[2:3] == win_ids).astype(jnp.float32)
            x = xwin[...]
            pi = _gather_t(x, oh_i)                # (8, A_BLK)
            pj = _gather_t(x, oh_j)
            pk = _gather_t(x, oh_k)

            _, _, _, rij, rik, rjk, cos = _geometry(pi, pj, pk)
            tabs = _tables(st, rij, rik, rjk, cos, with_derivs=False)
            rep_rows = _rep_rows(st, tabs)         # (m, A_BLK)
            pair_id = _pair_id(st, pj[3:4], pk[3:4])
            oh_recv = (ids[0:1] == row_ids).astype(jnp.float32)
            acc[...] += _pool_rel(st.num_rel, len(st.eta_inv), oh_recv,
                                    rep_rows, pair_id, f_pad)
            return ()

        jax.lax.fori_loop(0, num_chunks, body, (), unroll=False)
        out_ref[...] = acc[...].astype(out_ref.dtype)

    return kernel


def _make_jvp_kernel(st: G4Static, n_pad: int, f_pad: int):
    def kernel(off_ref, ids_hbm, x_hbm, dx_hbm, out_ref, acc, xwin, dxwin,
               iscr, sems, xsem, dxsem):
        i = pl.program_id(0)
        e0 = off_ref[i]
        e1 = off_ref[i + 1]
        start = (e0 // A_BLK) * A_BLK
        num_chunks = jax.lax.max(((e1 + A_BLK - 1 - start) // A_BLK), 0)

        s_lo = _block_window(i, n_pad)
        pltpu.make_async_copy(x_hbm.at[:, pl.ds(s_lo, W_WIN)], xwin,
                              xsem).start()
        pltpu.make_async_copy(dx_hbm.at[:, pl.ds(s_lo, W_WIN)], dxwin,
                              dxsem).start()
        acc[...] = jnp.zeros_like(acc)

        row_ids = jax.lax.broadcasted_iota(
            jnp.int32, (N_BLK, A_BLK), 0) + i * N_BLK
        win_ids = jax.lax.broadcasted_iota(
            jnp.int32, (W_WIN, A_BLK), 0) + s_lo

        def dma(slot, chunk):
            a0 = start + chunk * A_BLK
            return pltpu.make_async_copy(
                ids_hbm.at[:, pl.ds(a0, A_BLK)], iscr.at[slot],
                sems.at[slot])

        @pl.when(num_chunks > 0)
        def _():
            dma(0, 0).start()

        pltpu.make_async_copy(x_hbm.at[:, pl.ds(s_lo, W_WIN)], xwin,
                              xsem).wait()
        pltpu.make_async_copy(dx_hbm.at[:, pl.ds(s_lo, W_WIN)], dxwin,
                              dxsem).wait()

        def body(chunk, _):
            slot = chunk % 2

            @pl.when(chunk + 1 < num_chunks)
            def _():
                dma((chunk + 1) % 2, chunk + 1).start()

            dma(slot, chunk).wait()
            ids = iscr[slot]
            oh_i = (ids[0:1] == win_ids).astype(jnp.float32)
            oh_j = (ids[1:2] == win_ids).astype(jnp.float32)
            oh_k = (ids[2:3] == win_ids).astype(jnp.float32)
            x = xwin[...]
            dx = dxwin[...]
            pi = _gather_t(x, oh_i)
            pj = _gather_t(x, oh_j)
            pk = _gather_t(x, oh_k)
            dpi = _gather_t(dx, oh_i)
            dpj = _gather_t(dx, oh_j)
            dpk = _gather_t(dx, oh_k)

            vij, vik, vjk, rij, rik, rjk, cos = _geometry(pi, pj, pk)
            dvij = dpj - dpi
            dvik = dpk - dpi
            dvjk = dpk - dpj
            drij = _sum3(vij * dvij) / rij
            drik = _sum3(vik * dvik) / rik
            drjk = _sum3(vjk * dvjk) / rjk
            ds2 = 2.0 * (rij * drij + rik * drik + rjk * drjk)
            dcos = (_sum3(dvij * vik) + _sum3(vij * dvik)) / (rij * rik) \
                - cos * (drij / rij + drik / rik)

            tabs = _tables(st, rij, rik, rjk, cos, with_derivs=True)
            drep_rows = _drep_rows(st, tabs, dcos, ds2, drij, drik, drjk)
            pair_id = _pair_id(st, pj[3:4], pk[3:4])
            oh_recv = (ids[0:1] == row_ids).astype(jnp.float32)
            acc[...] += _pool_rel(st.num_rel, len(st.eta_inv), oh_recv,
                                    drep_rows, pair_id, f_pad)
            return ()

        jax.lax.fori_loop(0, num_chunks, body, (), unroll=False)
        out_ref[...] = acc[...].astype(out_ref.dtype)

    return kernel


def _make_vjp_kernel(st: G4Static, n_pad: int, f_pad: int):
    def kernel(off_ref, ids_hbm, x_hbm, ct_hbm, dpi_ref, dwin_ref,
               acc_i, acc_w, xwin, ctblk, iscr, sems, xsem, ctsem):
        i = pl.program_id(0)
        e0 = off_ref[i]
        e1 = off_ref[i + 1]
        start = (e0 // A_BLK) * A_BLK
        num_chunks = jax.lax.max(((e1 + A_BLK - 1 - start) // A_BLK), 0)

        s_lo = _block_window(i, n_pad)
        pltpu.make_async_copy(x_hbm.at[:, pl.ds(s_lo, W_WIN)], xwin,
                              xsem).start()
        pltpu.make_async_copy(ct_hbm.at[pl.ds(i * N_BLK, N_BLK), :], ctblk,
                              ctsem).start()
        acc_i[...] = jnp.zeros_like(acc_i)
        acc_w[...] = jnp.zeros_like(acc_w)

        row_ids = jax.lax.broadcasted_iota(
            jnp.int32, (N_BLK, A_BLK), 0) + i * N_BLK
        win_ids = jax.lax.broadcasted_iota(
            jnp.int32, (W_WIN, A_BLK), 0) + s_lo

        def dma(slot, chunk):
            a0 = start + chunk * A_BLK
            return pltpu.make_async_copy(
                ids_hbm.at[:, pl.ds(a0, A_BLK)], iscr.at[slot],
                sems.at[slot])

        @pl.when(num_chunks > 0)
        def _():
            dma(0, 0).start()

        pltpu.make_async_copy(x_hbm.at[:, pl.ds(s_lo, W_WIN)], xwin,
                              xsem).wait()
        pltpu.make_async_copy(ct_hbm.at[pl.ds(i * N_BLK, N_BLK), :], ctblk,
                              ctsem).wait()

        def body(chunk, _):
            slot = chunk % 2

            @pl.when(chunk + 1 < num_chunks)
            def _():
                dma((chunk + 1) % 2, chunk + 1).start()

            dma(slot, chunk).wait()
            ids = iscr[slot]
            oh_i = (ids[0:1] == win_ids).astype(jnp.float32)
            oh_j = (ids[1:2] == win_ids).astype(jnp.float32)
            oh_k = (ids[2:3] == win_ids).astype(jnp.float32)
            x = xwin[...]
            pi = _gather_t(x, oh_i)
            pj = _gather_t(x, oh_j)
            pk = _gather_t(x, oh_k)

            vij, vik, vjk, rij, rik, rjk, cos = _geometry(pi, pj, pk)
            tabs = _tables(st, rij, rik, rjk, cos, with_derivs=True)
            pair_id = _pair_id(st, pj[3:4], pk[3:4])
            oh_recv = (ids[0:1] == row_ids).astype(jnp.float32)
            drep_rows = _unpool_rel(st.num_rel, len(st.eta_inv), oh_recv,
                                    ctblk[...], pair_id)
            a_cos, a_s2, a_rij, a_rik, a_rjk = _rep_coeffs(
                st, tabs, drep_rows)
            d_vij, d_vik, d_vjk = _dv_from_coeffs(
                a_cos, a_s2, a_rij, a_rik, a_rjk,
                vij, vik, vjk, rij, rik, rjk, cos)
            d_pi = _row_mask3(-(d_vij + d_vik))    # (8, A_BLK)
            d_pj = _row_mask3(d_vij - d_vjk)
            d_pk = _row_mask3(d_vik + d_vjk)

            # scatter: center rows into this block, neighbors into the
            # window accumulator ((., 8) results padded to the lane tile)
            ci = _dot_nt(oh_recv, d_pi)            # (N_BLK, 8)
            acc_i[...] += jnp.pad(ci, ((0, 0), (0, 128 - 8)))
            cw = _dot_nt(oh_j, d_pj) + _dot_nt(oh_k, d_pk)  # (W_WIN, 8)
            acc_w[...] += jnp.pad(cw, ((0, 0), (0, 128 - 8)))
            return ()

        jax.lax.fori_loop(0, num_chunks, body, (), unroll=False)
        dpi_ref[...] = acc_i[...].astype(dpi_ref.dtype)
        dwin_ref[...] = acc_w[...].astype(dwin_ref.dtype)[None]

    return kernel


# ------------------------------------------------------------ wrappers ---

def _prep(angles: Array, angle_mask: Array, n_node: int, max_nodes: int):
    """Static padding/shapes shared by all three kernels.

    Window coverage (every angle's j/k within +-128 rows of its center)
    is the CALLER's contract — the ACSFG4 gate checks the batch's static
    ``angle_locality`` (within-graph indices bound it by max_nodes;
    locality-sorted giant molecules qualify too)."""
    a = angles.shape[0]
    a_pad = ((a + A_BLK - 1) // A_BLK) * A_BLK
    n_pad = max(((n_node + N_BLK - 1) // N_BLK) * N_BLK, W_WIN)
    # (4, A): rows i, j, k + one zero pad row (int32 sublane tiling needs
    # the leading dim aligned to 4 for HBM->VMEM slices)
    ids = jnp.transpose(angles[:, :3]).astype(jnp.int32)
    # fold the angle mask into the CENTER id: masked angles get center
    # n_pad, which matches no one-hot row in any kernel — they contribute
    # nothing to outputs or cotangents, so no mask stream is needed
    ids = ids.at[0].set(jnp.where(angle_mask, ids[0], jnp.int32(n_pad)))
    if a_pad != a:
        ids = jnp.pad(ids, ((0, 0), (0, a_pad - a)),
                      constant_values=jnp.int32(n_pad))
    ids = jnp.pad(ids, ((0, 1), (0, 0)))
    centers = ids[0]
    bounds = jnp.arange(0, n_pad + 1, N_BLK, dtype=jnp.int32)
    offsets = jnp.searchsorted(centers, bounds, side="left").astype(jnp.int32)
    return ids, offsets, a_pad, n_pad


def _pack_table_t(pos: Array, z: Array, n_pad: int) -> Array:
    """(8, N_pad) f32: sublanes 0..2 = xyz, sublane 3 = atomic number."""
    n = pos.shape[0]
    out = jnp.zeros((8, n_pad), jnp.float32)
    out = out.at[:3, :n].set(jnp.transpose(pos).astype(jnp.float32))
    out = out.at[3, :n].set(z.astype(jnp.float32))
    return out


@functools.partial(jax.jit, static_argnames=("st", "n_node", "max_nodes",
                                              "f_out", "interpret"))
def _g4_fwd(pos, z, angles, angle_mask, st: G4Static, n_node: int,
            max_nodes: int, f_out: int, interpret: bool = False):
    ids, offsets, a_pad, n_pad = _prep(angles, angle_mask, n_node, max_nodes)
    x = _pack_table_t(pos, z, n_pad)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_pad // N_BLK,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 2,
        out_specs=pl.BlockSpec((N_BLK, 128), lambda i, off: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((N_BLK, 128), jnp.float32),
            pltpu.VMEM((8, W_WIN), jnp.float32),
            pltpu.VMEM((2, 4, A_BLK), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
        ])
    out = pl.pallas_call(
        _make_fwd_kernel(st, n_pad, 128),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, 128), jnp.float32),
        interpret=interpret,
    )(offsets, ids, x)
    return out[:n_node, :f_out]


@functools.partial(jax.jit, static_argnames=("st", "n_node", "max_nodes",
                                              "f_out", "interpret"))
def _g4_jvp(pos, z, angles, angle_mask, dpos, st: G4Static, n_node: int,
            max_nodes: int, f_out: int, interpret: bool = False):
    ids, offsets, a_pad, n_pad = _prep(angles, angle_mask, n_node, max_nodes)
    x = _pack_table_t(pos, z, n_pad)
    dx = _pack_table_t(dpos, jnp.zeros_like(z), n_pad)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_pad // N_BLK,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 3,
        out_specs=pl.BlockSpec((N_BLK, 128), lambda i, off: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((N_BLK, 128), jnp.float32),
            pltpu.VMEM((8, W_WIN), jnp.float32),
            pltpu.VMEM((8, W_WIN), jnp.float32),
            pltpu.VMEM((2, 4, A_BLK), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ])
    out = pl.pallas_call(
        _make_jvp_kernel(st, n_pad, 128),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, 128), jnp.float32),
        interpret=interpret,
    )(offsets, ids, x, dx)
    return out[:n_node, :f_out]


@functools.partial(jax.jit, static_argnames=("st", "n_node", "max_nodes",
                                              "f_out", "interpret"))
def _g4_vjp(pos, z, angles, angle_mask, ct, st: G4Static, n_node: int,
            max_nodes: int, f_out: int, interpret: bool = False):
    ids, offsets, a_pad, n_pad = _prep(angles, angle_mask, n_node, max_nodes)
    x = _pack_table_t(pos, z, n_pad)
    ct_pad = jnp.zeros((n_pad, 128), jnp.float32)
    ct_pad = ct_pad.at[:n_node, :f_out].set(ct.astype(jnp.float32))
    n_blocks = n_pad // N_BLK
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 3,
        out_specs=[
            pl.BlockSpec((N_BLK, 128), lambda i, off: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, W_WIN, 128), lambda i, off: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((N_BLK, 128), jnp.float32),
            pltpu.VMEM((W_WIN, 128), jnp.float32),
            pltpu.VMEM((8, W_WIN), jnp.float32),
            pltpu.VMEM((N_BLK, 128), jnp.float32),
            pltpu.VMEM((2, 4, A_BLK), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ])
    d_center, d_win = pl.pallas_call(
        _make_vjp_kernel(st, n_pad, 128),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((n_pad, 128), jnp.float32),
                   jax.ShapeDtypeStruct((n_blocks, W_WIN, 128), jnp.float32)],
        interpret=interpret,
    )(offsets, ids, x, ct_pad)
    # combine: center rows + per-block neighbor windows at their offsets
    dpos_full = d_center
    for b in range(n_blocks):
        s_lo = min(max((b - 1) * N_BLK, 0), n_pad - W_WIN)
        dpos_full = jax.lax.dynamic_update_slice(
            dpos_full,
            jax.lax.dynamic_slice(dpos_full, (s_lo, 0), (W_WIN, 128))
            + d_win[b], (s_lo, 0))
    return dpos_full[:n_node, :3]


def acsf_g4_fused(pos: Array, z: Array, angles: Array, angle_mask: Array,
                  st: G4Static, n_node: int, max_nodes: int,
                  interpret: bool = False) -> Array:
    """Differentiable fused G4: (N, R*m) descriptors; every traversal of
    the flagship training (forward, force reverse, loss second-reverse)
    rides a fused kernel (see module docstring for the closure argument).
    """
    from jax.custom_derivatives import linear_call

    m = len(st.eta_inv)
    f_out = st.num_rel * m
    assert f_out <= 128, f"R*m={f_out} exceeds one lane tile"
    assert m <= 8, f"m={m} sets exceed the sublane tile"

    @functools.partial(jax.custom_jvp, nondiff_argnums=(1, 2, 3))
    def g4(pos, st_, n_node_, max_nodes_):
        return _g4_fwd(pos, z, angles, angle_mask, st_, n_node_,
                       max_nodes_, f_out, interpret=interpret)

    @g4.defjvp
    def g4_jvp(st_, n_node_, max_nodes_, primals, tangents):
        (p,) = primals
        (dp,) = tangents
        out = g4(p, st_, n_node_, max_nodes_)

        def jvp_fn(res, tangent):
            (p_res,) = res
            return _g4_jvp(p_res, z, angles, angle_mask, tangent, st_,
                           n_node_, max_nodes_, f_out, interpret=interpret)

        def vjp_fn(res, ct):
            (p_res,) = res
            return _g4_vjp(p_res, z, angles, angle_mask, ct, st_,
                           n_node_, max_nodes_, f_out, interpret=interpret)

        dout = linear_call(jvp_fn, vjp_fn, (p,), dp)
        return out, dout

    return g4(pos, st, n_node, max_nodes)


# ================================================================ G2 ===
# The same fused structure for the RADIAL descriptors: per (i, j) EDGE,
# rep_s = exp(-eta_s (r_ij - Rs_s)^2) * f_c(r_ij; rc_s), pooled per
# receiver x sender-element relation. Edges are receiver-sorted at batch
# build (THE batching invariant), so the identical block/window layout
# applies — only the per-edge math differs.

class G2Static(NamedTuple):
    sets: tuple              # m (eta, rs, rc) float triples
    elements: tuple          # atomic numbers (slots, must be sorted)
    num_rel: int             # = len(elements)


def make_static_g2(table: np.ndarray, elements) -> G2Static:
    """Factor the (R, m, 3) shared grid table into static per-set values.
    Requires the same grid for every element slot (make_param_table)."""
    assert table.ndim == 3, "fused G2 requires a shared (R, m, 3) table"
    assert bool(np.all(table == table[0:1])), \
        "fused G2 requires a shared grid-constant parameter table"
    g0 = table[0]
    return G2Static(
        sets=tuple((float(a), float(b), float(c)) for a, b, c in g0),
        elements=tuple(int(z) for z in np.asarray(elements)),
        num_rel=int(table.shape[0]))


def _slot_id(elements, zj):
    """Element slot id from gathered atomic numbers ((1, B) f32 row)."""
    slot = jnp.zeros_like(zj)
    for idx, z in enumerate(elements):
        slot = jnp.where(jnp.abs(zj - z) < 0.5, float(idx), slot)
    return slot


def _g2_rep_rows(st: G2Static, rij):
    rows = [jnp.exp(-eta * (rij - rs) ** 2) * _cutoff(rij, rc)
            for eta, rs, rc in st.sets]
    return jnp.concatenate(rows, axis=0)


def _g2_drep_dr(st: G2Static, rij):
    """(m, B) d rep_s / d r rows."""
    rows = []
    for eta, rs, rc in st.sets:
        g = jnp.exp(-eta * (rij - rs) ** 2)
        rows.append(-2.0 * eta * (rij - rs) * g * _cutoff(rij, rc)
                    + g * _cutoff_d(rij, rc))
    return jnp.concatenate(rows, axis=0)


def _make_g2_fwd_kernel(st: G2Static, n_pad: int, f_pad: int):
    def kernel(off_ref, ids_hbm, x_hbm, out_ref, acc, xwin, iscr, sems,
               xsem):
        i = pl.program_id(0)
        e0 = off_ref[i]
        e1 = off_ref[i + 1]
        start = (e0 // A_BLK) * A_BLK
        num_chunks = jax.lax.max(((e1 + A_BLK - 1 - start) // A_BLK), 0)

        s_lo = _block_window(i, n_pad)
        pltpu.make_async_copy(x_hbm.at[:, pl.ds(s_lo, W_WIN)], xwin,
                              xsem).start()
        acc[...] = jnp.zeros_like(acc)

        row_ids = jax.lax.broadcasted_iota(
            jnp.int32, (N_BLK, A_BLK), 0) + i * N_BLK
        win_ids = jax.lax.broadcasted_iota(
            jnp.int32, (W_WIN, A_BLK), 0) + s_lo

        def dma(slot, chunk):
            a0 = start + chunk * A_BLK
            return pltpu.make_async_copy(
                ids_hbm.at[:, pl.ds(a0, A_BLK)], iscr.at[slot],
                sems.at[slot])

        @pl.when(num_chunks > 0)
        def _():
            dma(0, 0).start()

        pltpu.make_async_copy(x_hbm.at[:, pl.ds(s_lo, W_WIN)], xwin,
                              xsem).wait()

        def body(chunk, _):
            slot = chunk % 2

            @pl.when(chunk + 1 < num_chunks)
            def _():
                dma((chunk + 1) % 2, chunk + 1).start()

            dma(slot, chunk).wait()
            ids = iscr[slot]
            oh_i = (ids[0:1] == win_ids).astype(jnp.float32)
            oh_j = (ids[1:2] == win_ids).astype(jnp.float32)
            x = xwin[...]
            pi = _gather_t(x, oh_i)
            pj = _gather_t(x, oh_j)
            vij = pj - pi
            rij = jnp.sqrt(jnp.maximum(_sum3(vij * vij), 1e-12))
            rep_rows = _g2_rep_rows(st, rij)
            rel = _slot_id(st.elements, pj[3:4])
            oh_recv = (ids[0:1] == row_ids).astype(jnp.float32)
            acc[...] += _pool_rel(st.num_rel, len(st.sets), oh_recv,
                                  rep_rows, rel, f_pad)
            return ()

        jax.lax.fori_loop(0, num_chunks, body, (), unroll=False)
        out_ref[...] = acc[...].astype(out_ref.dtype)

    return kernel


def _make_g2_jvp_kernel(st: G2Static, n_pad: int, f_pad: int):
    def kernel(off_ref, ids_hbm, x_hbm, dx_hbm, out_ref, acc, xwin, dxwin,
               iscr, sems, xsem, dxsem):
        i = pl.program_id(0)
        e0 = off_ref[i]
        e1 = off_ref[i + 1]
        start = (e0 // A_BLK) * A_BLK
        num_chunks = jax.lax.max(((e1 + A_BLK - 1 - start) // A_BLK), 0)

        s_lo = _block_window(i, n_pad)
        pltpu.make_async_copy(x_hbm.at[:, pl.ds(s_lo, W_WIN)], xwin,
                              xsem).start()
        pltpu.make_async_copy(dx_hbm.at[:, pl.ds(s_lo, W_WIN)], dxwin,
                              dxsem).start()
        acc[...] = jnp.zeros_like(acc)

        row_ids = jax.lax.broadcasted_iota(
            jnp.int32, (N_BLK, A_BLK), 0) + i * N_BLK
        win_ids = jax.lax.broadcasted_iota(
            jnp.int32, (W_WIN, A_BLK), 0) + s_lo

        def dma(slot, chunk):
            a0 = start + chunk * A_BLK
            return pltpu.make_async_copy(
                ids_hbm.at[:, pl.ds(a0, A_BLK)], iscr.at[slot],
                sems.at[slot])

        @pl.when(num_chunks > 0)
        def _():
            dma(0, 0).start()

        pltpu.make_async_copy(x_hbm.at[:, pl.ds(s_lo, W_WIN)], xwin,
                              xsem).wait()
        pltpu.make_async_copy(dx_hbm.at[:, pl.ds(s_lo, W_WIN)], dxwin,
                              dxsem).wait()

        def body(chunk, _):
            slot = chunk % 2

            @pl.when(chunk + 1 < num_chunks)
            def _():
                dma((chunk + 1) % 2, chunk + 1).start()

            dma(slot, chunk).wait()
            ids = iscr[slot]
            oh_i = (ids[0:1] == win_ids).astype(jnp.float32)
            oh_j = (ids[1:2] == win_ids).astype(jnp.float32)
            x = xwin[...]
            dx = dxwin[...]
            pi = _gather_t(x, oh_i)
            pj = _gather_t(x, oh_j)
            dpi = _gather_t(dx, oh_i)
            dpj = _gather_t(dx, oh_j)
            vij = pj - pi
            rij = jnp.sqrt(jnp.maximum(_sum3(vij * vij), 1e-12))
            drij = _sum3(vij * (dpj - dpi)) / rij
            drep_rows = _g2_drep_dr(st, rij) * drij
            rel = _slot_id(st.elements, pj[3:4])
            oh_recv = (ids[0:1] == row_ids).astype(jnp.float32)
            acc[...] += _pool_rel(st.num_rel, len(st.sets), oh_recv,
                                  drep_rows, rel, f_pad)
            return ()

        jax.lax.fori_loop(0, num_chunks, body, (), unroll=False)
        out_ref[...] = acc[...].astype(out_ref.dtype)

    return kernel


def _make_g2_vjp_kernel(st: G2Static, n_pad: int, f_pad: int):
    def kernel(off_ref, ids_hbm, x_hbm, ct_hbm, dpi_ref, dwin_ref,
               acc_i, acc_w, xwin, ctblk, iscr, sems, xsem, ctsem):
        i = pl.program_id(0)
        e0 = off_ref[i]
        e1 = off_ref[i + 1]
        start = (e0 // A_BLK) * A_BLK
        num_chunks = jax.lax.max(((e1 + A_BLK - 1 - start) // A_BLK), 0)

        s_lo = _block_window(i, n_pad)
        pltpu.make_async_copy(x_hbm.at[:, pl.ds(s_lo, W_WIN)], xwin,
                              xsem).start()
        pltpu.make_async_copy(ct_hbm.at[pl.ds(i * N_BLK, N_BLK), :], ctblk,
                              ctsem).start()
        acc_i[...] = jnp.zeros_like(acc_i)
        acc_w[...] = jnp.zeros_like(acc_w)

        row_ids = jax.lax.broadcasted_iota(
            jnp.int32, (N_BLK, A_BLK), 0) + i * N_BLK
        win_ids = jax.lax.broadcasted_iota(
            jnp.int32, (W_WIN, A_BLK), 0) + s_lo

        def dma(slot, chunk):
            a0 = start + chunk * A_BLK
            return pltpu.make_async_copy(
                ids_hbm.at[:, pl.ds(a0, A_BLK)], iscr.at[slot],
                sems.at[slot])

        @pl.when(num_chunks > 0)
        def _():
            dma(0, 0).start()

        pltpu.make_async_copy(x_hbm.at[:, pl.ds(s_lo, W_WIN)], xwin,
                              xsem).wait()
        pltpu.make_async_copy(ct_hbm.at[pl.ds(i * N_BLK, N_BLK), :], ctblk,
                              ctsem).wait()

        def body(chunk, _):
            slot = chunk % 2

            @pl.when(chunk + 1 < num_chunks)
            def _():
                dma((chunk + 1) % 2, chunk + 1).start()

            dma(slot, chunk).wait()
            ids = iscr[slot]
            oh_i = (ids[0:1] == win_ids).astype(jnp.float32)
            oh_j = (ids[1:2] == win_ids).astype(jnp.float32)
            x = xwin[...]
            pi = _gather_t(x, oh_i)
            pj = _gather_t(x, oh_j)
            vij = pj - pi
            rij = jnp.sqrt(jnp.maximum(_sum3(vij * vij), 1e-12))
            rel = _slot_id(st.elements, pj[3:4])
            oh_recv = (ids[0:1] == row_ids).astype(jnp.float32)
            drep_rows = _unpool_rel(st.num_rel, len(st.sets), oh_recv,
                                    ctblk[...], rel)
            # chain to positions: a_r = sum_s drep_s * d rep_s / d r
            a_r = jnp.sum(drep_rows[:len(st.sets)]
                          * _g2_drep_dr(st, rij), axis=0, keepdims=True)
            d_vij = _row_mask3(a_r * vij / rij)
            ci = _dot_nt(oh_recv, -d_vij)          # d_pi
            acc_i[...] += jnp.pad(ci, ((0, 0), (0, 128 - 8)))
            cw = _dot_nt(oh_j, d_vij)              # d_pj
            acc_w[...] += jnp.pad(cw, ((0, 0), (0, 128 - 8)))
            return ()

        jax.lax.fori_loop(0, num_chunks, body, (), unroll=False)
        dpi_ref[...] = acc_i[...].astype(dpi_ref.dtype)
        dwin_ref[...] = acc_w[...].astype(dwin_ref.dtype)[None]

    return kernel


def _prep_edges(senders: Array, receivers: Array, edge_mask: Array,
                n_node: int, max_nodes: int):
    """Edge analog of ``_prep``: receiver-sorted ids, masked receivers
    folded to n_pad (window coverage is the ACSFG2 gate's contract via
    ``edge_locality``)."""
    e = senders.shape[0]
    e_pad = ((e + A_BLK - 1) // A_BLK) * A_BLK
    n_pad = max(((n_node + N_BLK - 1) // N_BLK) * N_BLK, W_WIN)
    recv = jnp.where(edge_mask, receivers.astype(jnp.int32),
                     jnp.int32(n_pad))
    ids = jnp.stack([recv, senders.astype(jnp.int32)], axis=0)
    if e_pad != e:
        ids = jnp.pad(ids, ((0, 0), (0, e_pad - e)),
                      constant_values=jnp.int32(n_pad))
    ids = jnp.pad(ids, ((0, 2), (0, 0)))
    bounds = jnp.arange(0, n_pad + 1, N_BLK, dtype=jnp.int32)
    offsets = jnp.searchsorted(ids[0], bounds,
                               side="left").astype(jnp.int32)
    return ids, offsets, e_pad, n_pad


def _g2_grid_spec(n_pad, extra_inputs, extra_scratch):
    return pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_pad // N_BLK,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * (2 + extra_inputs),
        out_specs=pl.BlockSpec((N_BLK, 128), lambda i, off: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((N_BLK, 128), jnp.float32),
            pltpu.VMEM((8, W_WIN), jnp.float32),
        ] + extra_scratch + [
            pltpu.VMEM((2, 4, A_BLK), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
        ] + [pltpu.SemaphoreType.DMA] * extra_inputs)


@functools.partial(jax.jit, static_argnames=("st", "n_node", "max_nodes",
                                              "f_out", "interpret"))
def _g2_fwd(pos, z, senders, receivers, edge_mask, st: G2Static,
            n_node: int, max_nodes: int, f_out: int,
            interpret: bool = False):
    ids, offsets, e_pad, n_pad = _prep_edges(senders, receivers, edge_mask,
                                             n_node, max_nodes)
    x = _pack_table_t(pos, z, n_pad)
    out = pl.pallas_call(
        _make_g2_fwd_kernel(st, n_pad, 128),
        grid_spec=_g2_grid_spec(n_pad, 0, []),
        out_shape=jax.ShapeDtypeStruct((n_pad, 128), jnp.float32),
        interpret=interpret,
    )(offsets, ids, x)
    return out[:n_node, :f_out]


@functools.partial(jax.jit, static_argnames=("st", "n_node", "max_nodes",
                                              "f_out", "interpret"))
def _g2_jvp(pos, z, senders, receivers, edge_mask, dpos, st: G2Static,
            n_node: int, max_nodes: int, f_out: int,
            interpret: bool = False):
    ids, offsets, e_pad, n_pad = _prep_edges(senders, receivers, edge_mask,
                                             n_node, max_nodes)
    x = _pack_table_t(pos, z, n_pad)
    dx = _pack_table_t(dpos, jnp.zeros_like(z), n_pad)
    out = pl.pallas_call(
        _make_g2_jvp_kernel(st, n_pad, 128),
        grid_spec=_g2_grid_spec(n_pad, 1,
                                [pltpu.VMEM((8, W_WIN), jnp.float32)]),
        out_shape=jax.ShapeDtypeStruct((n_pad, 128), jnp.float32),
        interpret=interpret,
    )(offsets, ids, x, dx)
    return out[:n_node, :f_out]


@functools.partial(jax.jit, static_argnames=("st", "n_node", "max_nodes",
                                              "f_out", "interpret"))
def _g2_vjp(pos, z, senders, receivers, edge_mask, ct, st: G2Static,
            n_node: int, max_nodes: int, f_out: int,
            interpret: bool = False):
    ids, offsets, e_pad, n_pad = _prep_edges(senders, receivers, edge_mask,
                                             n_node, max_nodes)
    x = _pack_table_t(pos, z, n_pad)
    ct_pad = jnp.zeros((n_pad, 128), jnp.float32)
    ct_pad = ct_pad.at[:n_node, :f_out].set(ct.astype(jnp.float32))
    n_blocks = n_pad // N_BLK
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 3,
        out_specs=[
            pl.BlockSpec((N_BLK, 128), lambda i, off: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, W_WIN, 128), lambda i, off: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((N_BLK, 128), jnp.float32),
            pltpu.VMEM((W_WIN, 128), jnp.float32),
            pltpu.VMEM((8, W_WIN), jnp.float32),
            pltpu.VMEM((N_BLK, 128), jnp.float32),
            pltpu.VMEM((2, 4, A_BLK), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ])
    d_center, d_win = pl.pallas_call(
        _make_g2_vjp_kernel(st, n_pad, 128),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((n_pad, 128), jnp.float32),
                   jax.ShapeDtypeStruct((n_blocks, W_WIN, 128), jnp.float32)],
        interpret=interpret,
    )(offsets, ids, x, ct_pad)
    dpos_full = d_center
    for b in range(n_blocks):
        s_lo = min(max((b - 1) * N_BLK, 0), n_pad - W_WIN)
        dpos_full = jax.lax.dynamic_update_slice(
            dpos_full,
            jax.lax.dynamic_slice(dpos_full, (s_lo, 0), (W_WIN, 128))
            + d_win[b], (s_lo, 0))
    return dpos_full[:n_node, :3]


def acsf_g2_fused(pos: Array, z: Array, senders: Array, receivers: Array,
                  edge_mask: Array, st: G2Static, n_node: int,
                  max_nodes: int, interpret: bool = False) -> Array:
    """Differentiable fused G2 (same AD-closure as ``acsf_g4_fused``)."""
    from jax.custom_derivatives import linear_call

    m = len(st.sets)
    f_out = st.num_rel * m
    assert f_out <= 128, f"R*m={f_out} exceeds one lane tile"
    assert m <= 8, f"m={m} sets exceed the sublane tile"

    @functools.partial(jax.custom_jvp, nondiff_argnums=(1, 2, 3))
    def g2(pos, st_, n_node_, max_nodes_):
        return _g2_fwd(pos, z, senders, receivers, edge_mask, st_,
                       n_node_, max_nodes_, f_out, interpret=interpret)

    @g2.defjvp
    def g2_jvp(st_, n_node_, max_nodes_, primals, tangents):
        (p,) = primals
        (dp,) = tangents
        out = g2(p, st_, n_node_, max_nodes_)

        def jvp_fn(res, tangent):
            (p_res,) = res
            return _g2_jvp(p_res, z, senders, receivers, edge_mask,
                           tangent, st_, n_node_, max_nodes_, f_out,
                           interpret=interpret)

        def vjp_fn(res, ct):
            (p_res,) = res
            return _g2_vjp(p_res, z, senders, receivers, edge_mask, ct,
                           st_, n_node_, max_nodes_, f_out,
                           interpret=interpret)

        dout = linear_call(jvp_fn, vjp_fn, (p,), dp)
        return out, dout

    return g2(pos, st, n_node, max_nodes)
