"""Pallas TPU kernels: FULLY fused ACSF G4 angular descriptors.

The G4 chain (``layers/conv/acsf.py:ACSFG4``, reference semantics
``kgcnn/layers/conv/acsf_conv.py:430-510``) is the flagship HDNNP4th's
dominant cost: at bench shapes (100k angle triples, 15 element pairs x 8
sets) the unfused forward+backward takes 5.1 ms of the 11.7 ms train step
(tools/bench_g4.py). XLA materializes every (A, .) intermediate — three
position gathers, distances, transcendental tables, the (A, R*m) one-hot
expansion — in HBM, in EVERY autodiff traversal.

These kernels keep the whole pipeline in VMEM with the windowed-gather
layout proven by ``fused_aggregate.py``: angles are CENTER-SORTED at batch
build, so each 128-row output block owns a contiguous angle range, and all
three nodes of those angles live inside a ``max_nodes``-margin node window
around the block (the batching invariant) — one (W, 128) window DMA per
block serves every gather as a one-hot MXU matmul.

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
lanes, f32, single-device batches (edge-partitioned shards fall back to
the unfused path).
"""
from __future__ import annotations

import functools
import math
from typing import Any, NamedTuple, Sequence

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .segment_sum import onehot_dot
from .fused_aggregate import _onehot_dot_t

Array = jax.Array

N_BLK = 128
A_BLK = 1024


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
        elements=tuple(int(z) for z in np.sort(np.asarray(elements))),
        keep_pair_order=bool(keep_pair_order),
        num_rel=int(num_rel),
        scale=1.0 / float(multiplicity) if multiplicity else 1.0)


# ------------------------------------------------------------ kernel math

def _sum3(v):
    """Sum of the first 3 lanes of a (B, 128) register, keepdims."""
    return (v[:, 0:1] + v[:, 1:2] + v[:, 2:3])


def _geometry(pi, pj, pk):
    eps = 1e-12
    vij = pj - pi
    vik = pk - pi
    vjk = pk - pj
    r2ij = _sum3(vij * vij)
    r2ik = _sum3(vik * vik)
    r2jk = _sum3(vjk * vjk)
    rij = jnp.sqrt(jnp.maximum(r2ij, eps))
    rik = jnp.sqrt(jnp.maximum(r2ik, eps))
    rjk = jnp.sqrt(jnp.maximum(r2jk, eps))
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
    """Per-angle unique transcendental tables (and their derivatives).
    Returns dict of lists indexed by unique-value position."""
    s2 = rij * rij + rik * rik + rjk * rjk
    e = [jnp.exp(-eta * s2) for eta in st.uniq_eta]
    c, dc = [], []
    for zeta, lam in st.uniq_zl:
        base = jnp.maximum(cos * lam + 1.0, 1e-30)
        p = (2.0 ** (1.0 - zeta)) * jnp.power(base, zeta)
        c.append(p)
        if with_derivs:
            dc.append((2.0 ** (1.0 - zeta)) * zeta * lam
                      * jnp.power(base, zeta - 1.0))
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
    """Pair relation id from gathered atomic numbers (f32 lane values)."""
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


def _rep_sets(st: G4Static, tabs):
    """The m per-set descriptor values (each (B, 1)) with the static
    unique-table column picks (padding angles are excluded upstream by
    their n_pad center id — no one-hot row ever matches them)."""
    reps = []
    for s in range(len(st.eta_inv)):
        r = (tabs["c"][st.zl_inv[s]] * tabs["e"][st.eta_inv[s]]
             * tabs["f"][st.rc_inv[s]]) * st.scale
        reps.append(r)
    return reps


def _drep_sets(st: G4Static, tabs, dcos, ds2, drij, drik, drjk):
    """Tangent of each per-set descriptor given geometry tangents."""
    dreps = []
    for s in range(len(st.eta_inv)):
        c = tabs["c"][st.zl_inv[s]]
        e = tabs["e"][st.eta_inv[s]]
        f = tabs["f"][st.rc_inv[s]]
        dc = tabs["dc"][st.zl_inv[s]]
        de = tabs["de"][st.eta_inv[s]]
        d = (dc * e * f * dcos + c * de * f * ds2
             + c * e * (tabs["df_ij"][st.rc_inv[s]] * drij
                        + tabs["df_ik"][st.rc_inv[s]] * drik
                        + tabs["df_jk"][st.rc_inv[s]] * drjk))
        dreps.append(d * st.scale)
    return dreps


def _rep_coeffs(st: G4Static, tabs, drep_list):
    """Adjoint: fold per-set cotangents into the five geometry channels
    (a_cos, a_s2, a_rij, a_rik, a_rjk), each (B, 1)."""
    zero = jnp.zeros_like(tabs["s2"])
    a_cos = a_s2 = a_rij = a_rik = a_rjk = zero
    for s in range(len(st.eta_inv)):
        ct = drep_list[s] * st.scale
        c = tabs["c"][st.zl_inv[s]]
        e = tabs["e"][st.eta_inv[s]]
        f = tabs["f"][st.rc_inv[s]]
        a_cos = a_cos + ct * tabs["dc"][st.zl_inv[s]] * e * f
        a_s2 = a_s2 + ct * c * tabs["de"][st.eta_inv[s]] * f
        a_rij = a_rij + ct * c * e * tabs["df_ij"][st.rc_inv[s]]
        a_rik = a_rik + ct * c * e * tabs["df_ik"][st.rc_inv[s]]
        a_rjk = a_rjk + ct * c * e * tabs["df_jk"][st.rc_inv[s]]
    return a_cos, a_s2, a_rij, a_rik, a_rjk


def _expand(st: G4Static, reps, pair_id, f_pad):
    """(B, R*m) lane expansion from m per-set (B, 1) values + pair id."""
    m = len(st.eta_inv)
    cols = []
    for r in range(st.num_rel):
        sel = (jnp.abs(pair_id - r) < 0.5).astype(reps[0].dtype)
        for s in range(m):
            cols.append(reps[s] * sel)
    out = jnp.concatenate(cols, axis=1)
    if f_pad > st.num_rel * m:
        out = jnp.concatenate(
            [out, jnp.zeros((out.shape[0], f_pad - st.num_rel * m),
                            out.dtype)], axis=1)
    return out


def _collapse(st: G4Static, drep_exp, pair_id):
    """Adjoint of ``_expand``: (B, f_pad) -> m per-set (B, 1) cotangents."""
    m = len(st.eta_inv)
    outs = [jnp.zeros_like(pair_id) for _ in range(m)]
    for r in range(st.num_rel):
        sel = (jnp.abs(pair_id - r) < 0.5).astype(drep_exp.dtype)
        for s in range(m):
            outs[s] = outs[s] + drep_exp[:, r * m + s:r * m + s + 1] * sel
    return outs


# ------------------------------------------------------------- kernels ---

def _dv_from_coeffs(a_cos, a_s2, a_rij, a_rik, a_rjk,
                    vij, vik, vjk, rij, rik, rjk, cos):
    """Geometry-channel cotangents -> (d_vij, d_vik, d_vjk) vectors."""
    inv_ij = 1.0 / rij
    inv_ik = 1.0 / rik
    inv_jk = 1.0 / rjk
    # dcos/dvij = vik/(rij rik) - cos vij/rij^2 ; symmetric for vik
    d_vij = (a_cos * (vik * (inv_ij * inv_ik) - vij * (cos * inv_ij * inv_ij))
             + a_s2 * 2.0 * vij + a_rij * vij * inv_ij)
    d_vik = (a_cos * (vij * (inv_ij * inv_ik) - vik * (cos * inv_ik * inv_ik))
             + a_s2 * 2.0 * vik + a_rik * vik * inv_ik)
    d_vjk = a_s2 * 2.0 * vjk + a_rjk * vjk * inv_jk
    return d_vij, d_vik, d_vjk


def _make_fwd_kernel(st: G4Static, w_win: int, n_pad: int, f_pad: int):
    def kernel(off_ref, ids_hbm, x_hbm, out_ref,
               acc, xwin, iscr, sems, xsem):
        i = pl.program_id(0)
        e0 = off_ref[i]
        e1 = off_ref[i + 1]
        start = (e0 // A_BLK) * A_BLK
        num_chunks = jax.lax.max(((e1 + A_BLK - 1 - start) // A_BLK), 0)

        s_lo = jax.lax.clamp(0, i * N_BLK - (w_win - N_BLK) // 2,
                             n_pad - w_win)
        pltpu.make_async_copy(x_hbm.at[pl.ds(s_lo, w_win), :], xwin,
                              xsem).start()
        acc[...] = jnp.zeros_like(acc)

        row_base = i * N_BLK
        row_ids = jax.lax.broadcasted_iota(
            jnp.int32, (N_BLK, A_BLK), 0) + row_base
        win_ids = jax.lax.broadcasted_iota(
            jnp.int32, (w_win, A_BLK), 0) + s_lo

        def get_dmas(slot, chunk):
            a0 = start + chunk * A_BLK
            d_ids = pltpu.make_async_copy(
                ids_hbm.at[:, pl.ds(a0, A_BLK)], iscr.at[slot],
                sems.at[slot, 0])
            return (d_ids,)

        @pl.when(num_chunks > 0)
        def _():
            for d in get_dmas(0, 0):
                d.start()

        pltpu.make_async_copy(x_hbm.at[pl.ds(s_lo, w_win), :], xwin,
                              xsem).wait()

        def body(chunk, _):
            slot = chunk % 2
            nxt = (chunk + 1) % 2

            @pl.when(chunk + 1 < num_chunks)
            def _():
                for d in get_dmas(nxt, chunk + 1):
                    d.start()

            for d in get_dmas(slot, chunk):
                d.wait()

            ids = iscr[slot]            # (3, A_BLK) int32: i, j, k
            oh_i = (ids[0:1] == win_ids).astype(jnp.float32)
            oh_j = (ids[1:2] == win_ids).astype(jnp.float32)
            oh_k = (ids[2:3] == win_ids).astype(jnp.float32)
            x = xwin[...]
            pi = _onehot_dot_t(oh_i, x, exact=True)   # (A_BLK, 128)
            pj = _onehot_dot_t(oh_j, x, exact=True)
            pk = _onehot_dot_t(oh_k, x, exact=True)

            vij, vik, vjk, rij, rik, rjk, cos = _geometry(pi, pj, pk)
            tabs = _tables(st, rij, rik, rjk, cos, with_derivs=False)
            reps = _rep_sets(st, tabs)
            pair_id = _pair_id(st, pj[:, 3:4], pk[:, 3:4])
            rep_exp = _expand(st, reps, pair_id, f_pad)

            oh_recv = (ids[0:1] == row_ids).astype(jnp.float32)
            acc[...] += onehot_dot(oh_recv, rep_exp, exact=False)
            return ()

        jax.lax.fori_loop(0, num_chunks, body, (), unroll=False)
        out_ref[...] = acc[...].astype(out_ref.dtype)

    return kernel


def _make_jvp_kernel(st: G4Static, w_win: int, n_pad: int, f_pad: int):
    def kernel(off_ref, ids_hbm, x_hbm, dx_hbm, out_ref,
               acc, xwin, dxwin, iscr, sems, xsem, dxsem):
        i = pl.program_id(0)
        e0 = off_ref[i]
        e1 = off_ref[i + 1]
        start = (e0 // A_BLK) * A_BLK
        num_chunks = jax.lax.max(((e1 + A_BLK - 1 - start) // A_BLK), 0)

        s_lo = jax.lax.clamp(0, i * N_BLK - (w_win - N_BLK) // 2,
                             n_pad - w_win)
        pltpu.make_async_copy(x_hbm.at[pl.ds(s_lo, w_win), :], xwin,
                              xsem).start()
        pltpu.make_async_copy(dx_hbm.at[pl.ds(s_lo, w_win), :], dxwin,
                              dxsem).start()
        acc[...] = jnp.zeros_like(acc)

        row_base = i * N_BLK
        row_ids = jax.lax.broadcasted_iota(
            jnp.int32, (N_BLK, A_BLK), 0) + row_base
        win_ids = jax.lax.broadcasted_iota(
            jnp.int32, (w_win, A_BLK), 0) + s_lo

        def get_dmas(slot, chunk):
            a0 = start + chunk * A_BLK
            return (pltpu.make_async_copy(
                        ids_hbm.at[:, pl.ds(a0, A_BLK)], iscr.at[slot],
                        sems.at[slot, 0]),)

        @pl.when(num_chunks > 0)
        def _():
            for d in get_dmas(0, 0):
                d.start()

        pltpu.make_async_copy(x_hbm.at[pl.ds(s_lo, w_win), :], xwin,
                              xsem).wait()
        pltpu.make_async_copy(dx_hbm.at[pl.ds(s_lo, w_win), :], dxwin,
                              dxsem).wait()

        def body(chunk, _):
            slot = chunk % 2
            nxt = (chunk + 1) % 2

            @pl.when(chunk + 1 < num_chunks)
            def _():
                for d in get_dmas(nxt, chunk + 1):
                    d.start()

            for d in get_dmas(slot, chunk):
                d.wait()

            ids = iscr[slot]
            oh_i = (ids[0:1] == win_ids).astype(jnp.float32)
            oh_j = (ids[1:2] == win_ids).astype(jnp.float32)
            oh_k = (ids[2:3] == win_ids).astype(jnp.float32)
            x = xwin[...]
            dx = dxwin[...]
            pi = _onehot_dot_t(oh_i, x, exact=True)
            pj = _onehot_dot_t(oh_j, x, exact=True)
            pk = _onehot_dot_t(oh_k, x, exact=True)
            dpi = _onehot_dot_t(oh_i, dx, exact=True)
            dpj = _onehot_dot_t(oh_j, dx, exact=True)
            dpk = _onehot_dot_t(oh_k, dx, exact=True)

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
            dreps = _drep_sets(st, tabs, dcos, ds2, drij, drik, drjk)
            pair_id = _pair_id(st, pj[:, 3:4], pk[:, 3:4])
            drep_exp = _expand(st, dreps, pair_id, f_pad)

            oh_recv = (ids[0:1] == row_ids).astype(jnp.float32)
            acc[...] += onehot_dot(oh_recv, drep_exp, exact=False)
            return ()

        jax.lax.fori_loop(0, num_chunks, body, (), unroll=False)
        out_ref[...] = acc[...].astype(out_ref.dtype)

    return kernel


def _make_vjp_kernel(st: G4Static, w_win: int, n_pad: int, f_pad: int):
    def kernel(off_ref, ids_hbm, x_hbm, ct_hbm, dpi_ref, dwin_ref,
               acc_i, acc_w, xwin, ctblk, iscr, sems, xsem, ctsem):
        i = pl.program_id(0)
        e0 = off_ref[i]
        e1 = off_ref[i + 1]
        start = (e0 // A_BLK) * A_BLK
        num_chunks = jax.lax.max(((e1 + A_BLK - 1 - start) // A_BLK), 0)

        s_lo = jax.lax.clamp(0, i * N_BLK - (w_win - N_BLK) // 2,
                             n_pad - w_win)
        pltpu.make_async_copy(x_hbm.at[pl.ds(s_lo, w_win), :], xwin,
                              xsem).start()
        pltpu.make_async_copy(ct_hbm.at[pl.ds(i * N_BLK, N_BLK), :], ctblk,
                              ctsem).start()
        acc_i[...] = jnp.zeros_like(acc_i)
        acc_w[...] = jnp.zeros_like(acc_w)

        row_base = i * N_BLK
        row_ids = jax.lax.broadcasted_iota(
            jnp.int32, (N_BLK, A_BLK), 0) + row_base
        win_ids = jax.lax.broadcasted_iota(
            jnp.int32, (w_win, A_BLK), 0) + s_lo

        def get_dmas(slot, chunk):
            a0 = start + chunk * A_BLK
            return (pltpu.make_async_copy(
                        ids_hbm.at[:, pl.ds(a0, A_BLK)], iscr.at[slot],
                        sems.at[slot, 0]),)

        @pl.when(num_chunks > 0)
        def _():
            for d in get_dmas(0, 0):
                d.start()

        pltpu.make_async_copy(x_hbm.at[pl.ds(s_lo, w_win), :], xwin,
                              xsem).wait()
        pltpu.make_async_copy(ct_hbm.at[pl.ds(i * N_BLK, N_BLK), :], ctblk,
                              ctsem).wait()

        def body(chunk, _):
            slot = chunk % 2
            nxt = (chunk + 1) % 2

            @pl.when(chunk + 1 < num_chunks)
            def _():
                for d in get_dmas(nxt, chunk + 1):
                    d.start()

            for d in get_dmas(slot, chunk):
                d.wait()

            ids = iscr[slot]
            oh_i = (ids[0:1] == win_ids).astype(jnp.float32)
            oh_j = (ids[1:2] == win_ids).astype(jnp.float32)
            oh_k = (ids[2:3] == win_ids).astype(jnp.float32)
            x = xwin[...]
            pi = _onehot_dot_t(oh_i, x, exact=True)
            pj = _onehot_dot_t(oh_j, x, exact=True)
            pk = _onehot_dot_t(oh_k, x, exact=True)

            vij, vik, vjk, rij, rik, rjk, cos = _geometry(pi, pj, pk)
            tabs = _tables(st, rij, rik, rjk, cos, with_derivs=True)
            pair_id = _pair_id(st, pj[:, 3:4], pk[:, 3:4])

            # gather this chunk's rows of ct: (A_BLK, f_pad)
            oh_recv = (ids[0:1] == row_ids).astype(jnp.float32)
            drep_exp = _onehot_dot_t(oh_recv, ctblk[...], exact=True)
            drep_list = _collapse(st, drep_exp, pair_id)
            a_cos, a_s2, a_rij, a_rik, a_rjk = _rep_coeffs(
                st, tabs, drep_list)
            d_vij, d_vik, d_vjk = _dv_from_coeffs(
                a_cos, a_s2, a_rij, a_rik, a_rjk,
                vij, vik, vjk, rij, rik, rjk, cos)
            d_pi = -(d_vij + d_vik)
            d_pj = d_vij - d_vjk
            d_pk = d_vik + d_vjk

            # scatter: center contributions to this block's own rows,
            # neighbor contributions to the window accumulator
            acc_i[...] += onehot_dot(oh_recv, d_pi, exact=False)
            acc_w[...] += onehot_dot(oh_j, d_pj, exact=False)
            acc_w[...] += onehot_dot(oh_k, d_pk, exact=False)
            return ()

        jax.lax.fori_loop(0, num_chunks, body, (), unroll=False)
        dpi_ref[...] = acc_i[...].astype(dpi_ref.dtype)
        dwin_ref[...] = acc_w[...].astype(dwin_ref.dtype)[None]

    return kernel


# ------------------------------------------------------------ wrappers ---

def _prep(angles: Array, angle_mask: Array, n_node: int, max_nodes: int):
    """Static padding/shapes shared by all three kernels."""
    a = angles.shape[0]
    a_pad = ((a + A_BLK - 1) // A_BLK) * A_BLK
    n_pad = ((n_node + N_BLK - 1) // N_BLK) * N_BLK
    margin = ((max_nodes + 8) // 8) * 8
    w_win = min(n_pad, N_BLK + 2 * margin)
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
    return ids, offsets, a_pad, n_pad, w_win


def _pack_table(pos: Array, z: Array, n_pad: int) -> Array:
    """(N_pad, 128) f32: lanes 0..2 = positions, lane 3 = atomic number."""
    n = pos.shape[0]
    out = jnp.zeros((n_pad, 128), jnp.float32)
    out = out.at[:n, :3].set(pos.astype(jnp.float32))
    out = out.at[:n, 3].set(z.astype(jnp.float32))
    return out


@functools.partial(jax.jit, static_argnames=("st", "n_node", "max_nodes",
                                              "f_out", "interpret"))
def _g4_fwd(pos, z, angles, angle_mask, st: G4Static, n_node: int,
            max_nodes: int, f_out: int, interpret: bool = False):
    ids, offsets, a_pad, n_pad, w_win = _prep(
        angles, angle_mask, n_node, max_nodes)
    x = _pack_table(pos, z, n_pad)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_pad // N_BLK,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 2,
        out_specs=pl.BlockSpec((N_BLK, 128), lambda i, off: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((N_BLK, 128), jnp.float32),
            pltpu.VMEM((w_win, 128), jnp.float32),
            pltpu.VMEM((2, 4, A_BLK), jnp.int32),
            pltpu.SemaphoreType.DMA((2, 1)),
            pltpu.SemaphoreType.DMA,
        ])
    out = pl.pallas_call(
        _make_fwd_kernel(st, w_win, n_pad, 128),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, 128), jnp.float32),
        interpret=interpret,
    )(offsets, ids, x)
    return out[:n_node, :f_out]


@functools.partial(jax.jit, static_argnames=("st", "n_node", "max_nodes",
                                              "f_out", "interpret"))
def _g4_jvp(pos, z, angles, angle_mask, dpos, st: G4Static, n_node: int,
            max_nodes: int, f_out: int, interpret: bool = False):
    ids, offsets, a_pad, n_pad, w_win = _prep(
        angles, angle_mask, n_node, max_nodes)
    x = _pack_table(pos, z, n_pad)
    dx = _pack_table(dpos, jnp.zeros_like(z), n_pad)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_pad // N_BLK,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 3,
        out_specs=pl.BlockSpec((N_BLK, 128), lambda i, off: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((N_BLK, 128), jnp.float32),
            pltpu.VMEM((w_win, 128), jnp.float32),
            pltpu.VMEM((w_win, 128), jnp.float32),
            pltpu.VMEM((2, 4, A_BLK), jnp.int32),
            pltpu.SemaphoreType.DMA((2, 1)),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ])
    out = pl.pallas_call(
        _make_jvp_kernel(st, w_win, n_pad, 128),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, 128), jnp.float32),
        interpret=interpret,
    )(offsets, ids, x, dx)
    return out[:n_node, :f_out]


@functools.partial(jax.jit, static_argnames=("st", "n_node", "max_nodes",
                                              "f_out", "interpret"))
def _g4_vjp(pos, z, angles, angle_mask, ct, st: G4Static, n_node: int,
            max_nodes: int, f_out: int, interpret: bool = False):
    ids, offsets, a_pad, n_pad, w_win = _prep(
        angles, angle_mask, n_node, max_nodes)
    x = _pack_table(pos, z, n_pad)
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
            pl.BlockSpec((1, w_win, 128), lambda i, off: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((N_BLK, 128), jnp.float32),
            pltpu.VMEM((w_win, 128), jnp.float32),
            pltpu.VMEM((w_win, 128), jnp.float32),
            pltpu.VMEM((N_BLK, 128), jnp.float32),
            pltpu.VMEM((2, 4, A_BLK), jnp.int32),
            pltpu.SemaphoreType.DMA((2, 1)),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ])
    d_center, d_win = pl.pallas_call(
        _make_vjp_kernel(st, w_win, n_pad, 128),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((n_pad, 128), jnp.float32),
                   jax.ShapeDtypeStruct((n_blocks, w_win, 128), jnp.float32)],
        interpret=interpret,
    )(offsets, ids, x, ct_pad)
    # combine: center rows + per-block neighbor windows at their offsets
    dpos_full = d_center
    half = (w_win - N_BLK) // 2
    for b in range(n_blocks):
        s_lo = min(max(b * N_BLK - half, 0), n_pad - w_win)
        dpos_full = jax.lax.dynamic_update_slice(
            dpos_full,
            jax.lax.dynamic_slice(dpos_full, (s_lo, 0), (w_win, 128))
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
