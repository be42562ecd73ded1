"""Scalable Qeq/CENT charge-equilibration solvers.

The reference (and round-1 here) materializes the dense per-molecule
(M+1, M+1) erf-Coulomb matrix and LU-solves it on one device
(``kgcnn/layers/conv/hdnnp_conv.py:250``) — O(M^2) memory, O(M^3) work,
replicated. This module removes that wall two ways (VERDICT r1 item 7):

1. ``solve_qeq_batch_sharded``: shard the G independent dense solves over
   the mesh with ``shard_map`` — each device LU-solves its slice of
   molecules; zero collectives in the solve itself.

2. ``solve_qeq_iterative``: matrix-free conjugate gradients on the
   erf-kernel matvec, computed in row blocks via ``lax.map`` so peak memory
   is O(M * block) instead of O(M^2). The total-charge constraint is
   eliminated by the Schur trick: with A q* = chi - lambda * 1,
   solve A x1 = chi and A x2 = 1 (A is SPD: screened Coulomb + positive
   hardness diagonal), then lambda = (1^T x1 - q_tot) / (1^T x2) and
   q = x1 - lambda x2 — identical to the bordered dense system.
   Differentiable: ``jax.scipy.sparse.linalg.cg`` carries the implicit
   linear-solve adjoint (transpose solve == same solve, A symmetric), so
   forces through the charge solve keep working.
"""
from __future__ import annotations

import math
import os
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Array = jax.Array


# ------------------------------------------------------- dense, sharded ---

def solve_qeq_batch_sharded(a: Array, rhs: Array, mesh: Mesh,
                            axis: str = "data") -> Array:
    """Batched dense solve ``a (G, K, K) @ x = rhs (G, K)`` with the G
    molecules sharded over the mesh. G must be divisible by the mesh size
    (pad with identity systems if needed)."""
    from jax import shard_map

    def device_solve(a_loc, rhs_loc):
        return jnp.linalg.solve(a_loc, rhs_loc[..., None])[..., 0]

    fn = shard_map(device_solve, mesh=mesh,
                   in_specs=(P(axis), P(axis)), out_specs=P(axis),
                   check_vma=False)
    return fn(a, rhs)


def solve_qeq_dense_cholesky(a_core: Array, border: Array, b: Array,
                             qtot: Array, corner: Array) -> Array:
    """Constrained Qeq solve via Cholesky + Schur complement instead of a
    pivoted LU of the bordered system.

    The bordered matrix ``[[A, m], [m^T, c]]`` the reference LU-solves
    (``kgcnn/layers/conv/hdnnp_conv.py:250``) is symmetric INDEFINITE —
    but ``A`` itself (erf-screened Coulomb + positive hardness diagonal,
    identity on padding rows) is SPD, so the constraint can be eliminated
    exactly: factor ``A = L L^T`` ONCE, solve the two rhs ``A y1 = b``
    and ``A y2 = m`` with the same factor, then
    ``lambda = (m^T y1 - qtot) / (m^T y2 - c)`` and
    ``q = y1 - lambda y2``.  Same solution, but Cholesky needs no
    pivoting — the row-swap selects that serialize a batched TPU LU
    disappear — and half the factorization FLOPs.  Fully differentiable
    (cholesky + triangular_solve carry exact JVP/VJP rules; the linear
    solve's implicit adjoint reuses the factor), any order.

    Args: ``a_core (G, M, M)`` SPD per molecule, ``border (G, M)`` = node
    mask (the constraint row), ``b (G, M)`` rhs, ``qtot (G,)`` total
    charge, ``corner (G,)`` the bordered corner (0, or 1 for empty
    graphs).  Returns ``q (G, M)``.
    """
    rhs2 = jnp.stack([b, border], axis=-1)                 # (G, M, 2)
    G, M = b.shape
    on_tpu = jax.default_backend() == "tpu"
    env = os.environ.get("GCNN_QEQ_LANES")  # "1" force (interpret off-TPU
    # — for parity tests), "0" disable
    if env not in (None, "0", "1"):
        raise ValueError(f"GCNN_QEQ_LANES={env!r}: use '0' or '1'")
    if env == "1" and M > 120:
        raise ValueError(
            f"GCNN_QEQ_LANES=1 forced the lane-packed kernel at M={M}, "
            "but its (M, M, 128) VMEM block requires M <= 120 "
            "(ops/pallas/spd_solve.py) — unset the override for giant "
            "molecules")
    use_lanes = (on_tpu and M <= 120 and G >= 2) if env is None \
        else env == "1"
    if use_lanes:
        # lane-packed Pallas Gauss-Jordan: the whole batched elimination
        # in ONE kernel launch (XLA's batched Cholesky+triangular solves
        # are ~3M tiny sequential ops — ~1.9 ms of launch tax at
        # flagship shapes; ops/pallas/spd_solve.py)
        from ...ops.pallas.spd_solve import spd_solve_lanes
        ys = spd_solve_lanes(a_core, rhs2,
                             interpret=not on_tpu)         # (G, M, 2)
    else:
        L = jnp.linalg.cholesky(a_core)
        ys = jax.scipy.linalg.cho_solve((L, True), rhs2)   # (G, M, 2)
    y1, y2 = ys[..., 0], ys[..., 1]
    num = jnp.sum(border * y1, axis=-1) - qtot             # (G,)
    den = jnp.sum(border * y2, axis=-1) - corner
    lam = num / jnp.where(den == 0.0, 1.0, den)
    return y1 - lam[:, None] * y2


# --------------------------------------------------- iterative (CG) path ---

def _erf_kernel_matvec(pos: Array, gamma_row_fn, diag: Array, mask: Array,
                       block: int = 128):
    """Matrix-free SPD matvec for one molecule.

    ``A q = diag * q + sum_j!=i erf(d_ij / (sqrt(2) gamma_ij)) / d_ij q_j``
    computed in row blocks of ``block`` (peak memory O(M * block))."""
    m = pos.shape[0]
    n_blocks = (m + block - 1) // block
    m_pad = n_blocks * block
    pos_p = jnp.pad(pos, ((0, m_pad - m), (0, 0)))
    mask_p = jnp.pad(mask.astype(pos.dtype), (0, m_pad - m))

    def matvec(q):
        q_pad = jnp.pad(q, (0, m_pad - m))

        def one_block(i):
            r0 = i * block
            pr = jax.lax.dynamic_slice(pos_p, (r0, 0), (block, 3))
            diff = pr[:, None, :] - pos_p[None, :, :]
            d = jnp.sqrt(jnp.sum(diff * diff, axis=-1) + 1e-12)
            gamma = gamma_row_fn(r0, block)              # (block, M_pad)
            off = jax.scipy.special.erf(d / (gamma * math.sqrt(2.0))) / d
            # zero the diagonal and padded rows/cols
            col_ids = jax.lax.broadcasted_iota(jnp.int32, (block, m_pad), 1)
            row_ids = jax.lax.broadcasted_iota(jnp.int32, (block, m_pad), 0) + r0
            off = jnp.where(col_ids == row_ids, 0.0, off)
            off = off * mask_p[None, :]
            mr = jax.lax.dynamic_slice(mask_p, (r0,), (block,))
            return (off @ q_pad) * mr

        out = jax.lax.map(one_block, jnp.arange(n_blocks))
        return out.reshape(m_pad)[:m] + diag * q

    return matvec


def solve_qeq_iterative(pos: Array, sigma: Array, hardness_diag: Array,
                        chi: Array, qtot: Array, mask: Array,
                        block: int = 128, tol: float = 1e-6,
                        maxiter: Optional[int] = None) -> Array:
    """Matrix-free constrained Qeq solve for ONE molecule (padded to M).

    pos (M, 3); sigma (M,) Gaussian widths (Bohr); hardness_diag (M,) the
    dense solver's diagonal (hardness + 1/(sigma sqrt(pi)), 1.0 on padding
    rows); chi (M,) electronegativities (zeroed on padding); qtot scalar;
    mask (M,) bool. Returns charges (M,) (zero on padding).

    Matches the fixed-Lagrange-slot dense solve of ``CENTCharge``
    (hdnnp_electro.py) to solver tolerance.
    """
    m = pos.shape[0]
    maskf = mask.astype(pos.dtype)
    sig_pad = jnp.pad(sigma, (0, ((m + block - 1) // block) * block - m),
                      constant_values=1.0)

    def gamma_row_fn(r0, blk):
        sr = jax.lax.dynamic_slice(sig_pad, (r0,), (blk,))
        return jnp.sqrt(sr[:, None] ** 2 + sig_pad[None, :] ** 2 + 1e-12)

    matvec = _erf_kernel_matvec(pos, gamma_row_fn, hardness_diag, mask,
                                block=block)

    # Jacobi preconditioner: the diagonal dominates (hardness + self term)
    inv_diag = 1.0 / jnp.maximum(hardness_diag, 1e-6)
    precond = lambda x: inv_diag * x

    def cg_solve(b):
        x, _ = jax.scipy.sparse.linalg.cg(matvec, b, tol=tol, M=precond,
                                          maxiter=maxiter)
        return x

    ones = maskf
    x1 = cg_solve(chi * maskf)
    x2 = cg_solve(ones)
    denom = jnp.sum(ones * x2)
    lam = (jnp.sum(ones * x1) - qtot) / jnp.where(denom != 0, denom, 1.0)
    q = x1 - lam * x2
    return q * maskf


def solve_qeq_iterative_batch(pos: Array, sigma: Array, hardness_diag: Array,
                              chi: Array, qtot: Array, mask: Array,
                              block: int = 128, tol: float = 1e-6,
                              maxiter: Optional[int] = None) -> Array:
    """vmap of ``solve_qeq_iterative`` over the molecule axis G."""
    fn = partial(solve_qeq_iterative, block=block, tol=tol, maxiter=maxiter)
    return jax.vmap(fn)(pos, sigma, hardness_diag, chi, qtot, mask)


# ------------------------------------------- mesh-sharded giant molecule ---

def _transposable_pcg(matvec, precond, b: Array, tol: float,
                      maxiter: Optional[int]) -> Array:
    """Preconditioned CG via ``lax.custom_linear_solve(symmetric=True)``
    whose solve closure has NO b-dependent constants.

    ``jax.scipy.sparse.linalg.cg`` bakes ``tol^2 * <b, b>`` into its solve
    jaxpr — a const derived from the OUTER b. That is fine for plain
    reverse mode (the transpose RULE runs with primal params), but when a
    solve call is STAGED with an unknown rhs (the recursive tangent call
    of ``_qeq_rows_custom`` under any outer differentiation), the const
    becomes an undefined primal and ``custom_linear_solve``'s transpose
    raises NotImplementedError (jax solves.py:404). Here the SAME
    relative threshold is computed INSIDE the solve closure from its own
    rhs argument, so no const depends on b and the call transposes in any
    staging context (an absolute threshold would be unreachable in f32
    for well-scaled systems and spin every solve to maxiter)."""
    maxiter = maxiter if maxiter is not None else 10 * b.shape[0]
    tol2 = float(tol) * float(tol)

    def solve(mv, bb):
        x0 = jnp.zeros_like(bb)
        r0 = bb
        z0 = precond(r0)
        gamma0 = jnp.sum(r0 * z0)
        thresh = tol2 * jnp.sum(bb * bb)

        # carry: x, r, z, p, gamma, k
        def cond2(c):
            _, r, _, _, _, k = c
            return (jnp.sum(r * r) > thresh) & (k < maxiter)

        def body2(c):
            x, r, z, p, gamma, k = c
            ap = mv(p)
            denom = jnp.sum(p * ap)
            alpha = gamma / jnp.where(denom != 0, denom, 1.0)
            x = x + alpha * p
            r = r - alpha * ap
            z = precond(r)
            gamma_new = jnp.sum(r * z)
            beta = gamma_new / jnp.where(gamma != 0, gamma, 1.0)
            p = z + beta * p
            return x, r, z, p, gamma_new, k + 1

        x, _, _, _, _, _ = jax.lax.while_loop(
            cond2, body2, (x0, r0, z0, z0, gamma0, jnp.zeros((), jnp.int32)))
        return x

    return jax.lax.custom_linear_solve(matvec, b, solve, symmetric=True)


def solve_qeq_rows_in_shard_map(pos_loc: Array, sig_loc: Array,
                                diag_loc: Array, mask_loc: Array,
                                chi_loc: Array, qtot: Array, axis: str,
                                tol: float = 1e-6,
                                maxiter: Optional[int] = None) -> Array:
    """Row-sharded constrained Qeq CG for ONE giant molecule, callable from
    INSIDE an existing ``shard_map`` over ``axis`` (the edge-partitioned
    model path, ``parallel/partitioned.py``). Each shard owns M/D
    consecutive rows in global order; per CG iteration the (M,) iterate is
    all-gathered over ICI and this shard computes its row block of the
    erf-kernel matvec — O(M^2/D) work, never a materialized M x M.
    Returns this shard's LOCAL charges (M/D,).

    Differentiable to ARBITRARY order: the solve is wrapped in a
    ``jax.custom_jvp`` whose tangent rule solves the bordered tangent
    system [[A,1],[1^T,0]][dq;dlam] = [dchi - dA q; dqtot] by RECURSIVELY
    calling this same solve on the tangent right-hand side. This keeps
    every differentiation order inside the calibrated first-order
    machinery: ``lax.custom_linear_solve``'s OWN jvp rule would couple the
    raw (pre-reconciliation) solve output into the tangent program, where
    per-shard partial cotangents from the dA(x) term mix with the
    replicated cotangents of the wrapped path — measurably wrong at second
    order (grads off by 1e4x; tools/debug_qeq_second_order.py is the
    minimal repro, tools/debug_partitioned_force_loss.py the flagship
    one). With the recursion, dA(x) consumes the POST-reconciliation
    boundary value through plain collectives whose conservative
    check_vma=False transposes are exact."""
    maskf_loc = mask_loc.astype(pos_loc.dtype)
    return _qeq_rows_custom(axis, tol, maxiter, pos_loc, sig_loc, diag_loc,
                            maskf_loc, chi_loc, qtot)


def _qeq_rows_primal(axis, tol, maxiter, pos_loc, sig_loc, diag_loc,
                     maskf_loc, chi_loc, qtot):
    """The reconciled first-order-safe solve body (see the wrapper's
    docstring). All collectives are linear (all_gather / the implicit
    reduce-scatter of its transpose), and ``jax.scipy.sparse.linalg.cg``
    carries the implicit adjoint solve, so ONE reverse pass through this
    matches the single-device solver — PROVIDED the adjoint solve's
    right-hand side is consistent across shards: each shard's loss seeds a
    cotangent only for ITS slice of the replicated solution, and
    ``custom_linear_solve``'s transpose would hand those differing vectors
    straight to the distributed matvec (which mixes per-device inputs via
    all_gather — garbage unless replicated). The ``_replicated_adjoint``
    wrapper (identity forward, psum transpose: the adjoint pair of
    broadcast/sum) reconciles the cotangents into the one full rhs before
    the adjoint CG runs."""

    from jax.custom_derivatives import linear_call

    def _replicated_adjoint(x):
        return linear_call(lambda _, v: v,
                           lambda _, ct: jax.lax.psum(ct, axis), None, x)
    m_loc = pos_loc.shape[0]
    i = jax.lax.axis_index(axis)

    def _gather_r(v):
        """all_gather for REPLICATED-cotangent consumers (the CG's rhs and
        the matvec's output, whose cotangents are identical on every shard
        thanks to ``_replicated_adjoint`` below): the standard psum-scatter
        transpose would count each path D times — taking this shard's
        SLICE of the (replicated) cotangent counts it exactly once.
        Gathers consumed INSIDE the matvec (pos/sig: per-row-block
        cotangents genuinely differ per shard) keep the standard summing
        transpose."""

        def trans(_, ct):
            return jax.lax.dynamic_slice(
                ct, (i * m_loc,) + (0,) * (ct.ndim - 1),
                (m_loc,) + ct.shape[1:])

        return linear_call(
            lambda _, x: jax.lax.all_gather(x, axis, tiled=True),
            trans, None, v)

    pos_all = jax.lax.all_gather(pos_loc, axis, tiled=True)
    sig_all = jax.lax.all_gather(sig_loc, axis, tiled=True)
    mask_all = jax.lax.all_gather(maskf_loc, axis, tiled=True)
    chi_all = _gather_r(chi_loc * maskf_loc)

    def matvec(q_all):
        diff = pos_loc[:, None, :] - pos_all[None, :, :]
        dist = jnp.sqrt(jnp.sum(diff * diff, axis=-1) + 1e-12)
        gamma = jnp.sqrt(sig_loc[:, None] ** 2 + sig_all[None, :] ** 2
                         + 1e-12)
        off = jax.scipy.special.erf(dist / (gamma * math.sqrt(2.0))) / dist
        row_g = jax.lax.broadcasted_iota(
            jnp.int32, (m_loc, pos_all.shape[0]), 0) + i * m_loc
        col_g = jax.lax.broadcasted_iota(
            jnp.int32, (m_loc, pos_all.shape[0]), 1)
        off = jnp.where(row_g == col_g, 0.0, off) * mask_all[None, :]
        local = (off @ q_all) * maskf_loc + diag_loc * \
            jax.lax.dynamic_slice(q_all, (i * m_loc,), (m_loc,))
        return _gather_r(local)

    inv_diag_all = _gather_r(1.0 / jnp.maximum(diag_loc, 1e-6))

    def cg(b):
        return _transposable_pcg(matvec, lambda x: inv_diag_all * x, b,
                                 tol, maxiter)

    ones = mask_all
    x1 = cg(chi_all)
    x2 = cg(ones)
    denom = jnp.sum(ones * x2)
    lam = (jnp.sum(ones * x1) - qtot) / jnp.where(denom != 0, denom, 1.0)
    q_all = (x1 - lam * x2) * mask_all
    q_all = _replicated_adjoint(q_all)
    return jax.lax.dynamic_slice(q_all, (i * m_loc,), (m_loc,))


@partial(jax.custom_jvp, nondiff_argnums=(0, 1, 2))
def _qeq_rows_custom(axis, tol, maxiter, pos_loc, sig_loc, diag_loc,
                     maskf_loc, chi_loc, qtot):
    return _qeq_rows_primal(axis, tol, maxiter, pos_loc, sig_loc, diag_loc,
                            maskf_loc, chi_loc, qtot)


@_qeq_rows_custom.defjvp
def _qeq_rows_jvp(axis, tol, maxiter, primals, tangents):
    """Tangent of the constrained solve: the bordered system gives
    [dq; dlam] = Solve(dchi - dA q, dqtot) — ONE more call of the SAME
    wrapped solve on the tangent rhs. (dA q) rows are computed with plain
    collectives; their transposes (psum-scatter of all_gather) are exact
    for the per-shard varying cotangents they produce, and the solve's
    output boundary is the reconciled q_loc — so reverse passes over this
    tangent program reuse only first-order-proven machinery."""
    pos_loc, sig_loc, diag_loc, maskf_loc, chi_loc, qtot = primals
    dpos, dsig, ddiag, _dmask, dchi, dqtot = tangents

    q_loc = _qeq_rows_custom(axis, tol, maxiter, pos_loc, sig_loc, diag_loc,
                             maskf_loc, chi_loc, qtot)

    m_loc = pos_loc.shape[0]
    i = jax.lax.axis_index(axis)
    q_all = jax.lax.all_gather(q_loc, axis, tiled=True)
    mask_all = jax.lax.all_gather(maskf_loc, axis, tiled=True)
    n_all = q_all.shape[0]

    def rows(p_l, s_l, d_l):
        """This shard's rows of A(pos, sig, diag) @ q, q held constant."""
        p_a = jax.lax.all_gather(p_l, axis, tiled=True)
        s_a = jax.lax.all_gather(s_l, axis, tiled=True)
        diff = p_l[:, None, :] - p_a[None, :, :]
        dist = jnp.sqrt(jnp.sum(diff * diff, axis=-1) + 1e-12)
        gamma = jnp.sqrt(s_l[:, None] ** 2 + s_a[None, :] ** 2 + 1e-12)
        off = jax.scipy.special.erf(dist / (gamma * math.sqrt(2.0))) / dist
        row_g = jax.lax.broadcasted_iota(jnp.int32, (m_loc, n_all), 0) \
            + i * m_loc
        col_g = jax.lax.broadcasted_iota(jnp.int32, (m_loc, n_all), 1)
        off = jnp.where(row_g == col_g, 0.0, off) * mask_all[None, :]
        return (off @ q_all) * maskf_loc + d_l * q_loc

    _, dAq_loc = jax.jvp(rows, (pos_loc, sig_loc, diag_loc),
                         (dpos, dsig, ddiag))
    drhs_loc = dchi * maskf_loc - dAq_loc
    dq_loc = _qeq_rows_custom(axis, tol, maxiter, pos_loc, sig_loc,
                              diag_loc, maskf_loc, drhs_loc, dqtot)
    return q_loc, dq_loc


def solve_qeq_iterative_sharded(pos: Array, sigma: Array,
                                hardness_diag: Array, chi: Array,
                                qtot: Array, mask: Array, mesh: Mesh,
                                axis: str = "data", tol: float = 1e-6,
                                maxiter: Optional[int] = None) -> Array:
    """ONE giant molecule's Qeq solve with the matvec ROWS sharded over the
    mesh — the full distributed long-range electrostatics capability
    (SURVEY §5 "distributed Qeq"; no reference counterpart).

    Each device owns M/D rows: per CG iteration it all-gathers the small
    (M,) iterate over ICI and computes its row block of the erf-kernel
    matvec locally — O(M^2/D) work and O(M * M/D) peak memory per device,
    never a materialized M x M. The CG loop itself runs replicated (scalars
    psum-reduced implicitly by the sharded matvec's math). M must be
    divisible by the mesh size (pad with masked rows).
    """
    from jax import shard_map

    m = pos.shape[0]
    d = mesh.shape[axis]
    assert m % d == 0, f"pad M={m} to a multiple of the mesh size {d}"
    maskf = mask.astype(pos.dtype)

    def matvec_local(pos_loc, sig_loc, diag_loc, mask_loc, pos_all, sig_all,
                     mask_all, q_all):
        """(M/D,) rows of A @ q on this shard."""
        m_loc = pos_loc.shape[0]
        diff = pos_loc[:, None, :] - pos_all[None, :, :]
        dist = jnp.sqrt(jnp.sum(diff * diff, axis=-1) + 1e-12)
        gamma = jnp.sqrt(sig_loc[:, None] ** 2 + sig_all[None, :] ** 2 + 1e-12)
        off = jax.scipy.special.erf(dist / (gamma * math.sqrt(2.0))) / dist
        # zero diagonal: this shard's global row r sits at column r
        i = jax.lax.axis_index(axis)
        row_g = jax.lax.broadcasted_iota(jnp.int32, (m_loc, pos_all.shape[0]),
                                         0) + i * m_loc
        col_g = jax.lax.broadcasted_iota(jnp.int32, (m_loc, pos_all.shape[0]),
                                         1)
        off = jnp.where(row_g == col_g, 0.0, off) * mask_all[None, :]
        return (off @ q_all) * mask_loc + diag_loc * \
            jax.lax.dynamic_slice(q_all, (i * m_loc,), (m_loc,))

    def device_solve(pos_s, sig_s, diag_s, mask_s, chi_rep, qtot_rep,
                     mask_rep):
        pos_loc, sig_loc = pos_s[0], sig_s[0]
        diag_loc, mask_loc = diag_s[0], mask_s[0]
        pos_all = jax.lax.all_gather(pos_loc, axis, tiled=True)
        sig_all = jax.lax.all_gather(sig_loc, axis, tiled=True)
        mask_all = jax.lax.all_gather(mask_loc, axis, tiled=True)

        def matvec(q):
            local = matvec_local(pos_loc, sig_loc, diag_loc, mask_loc,
                                 pos_all, sig_all, mask_all, q)
            return jax.lax.all_gather(local, axis, tiled=True)

        inv_diag_all = jax.lax.all_gather(
            1.0 / jnp.maximum(diag_loc, 1e-6), axis, tiled=True)
        precond = lambda x: inv_diag_all * x

        def cg(b):
            x, _ = jax.scipy.sparse.linalg.cg(matvec, b, tol=tol, M=precond,
                                              maxiter=maxiter)
            return x

        ones = mask_rep
        x1 = cg(chi_rep * mask_rep)
        x2 = cg(ones)
        denom = jnp.sum(ones * x2)
        lam = (jnp.sum(ones * x1) - qtot_rep) / jnp.where(denom != 0,
                                                          denom, 1.0)
        q = (x1 - lam * x2) * mask_rep
        return q

    from jax.sharding import PartitionSpec as P
    fn = shard_map(device_solve, mesh=mesh,
                   in_specs=(P(axis), P(axis), P(axis), P(axis),
                             P(), P(), P()),
                   out_specs=P(), check_vma=False)
    ml = m // d
    return fn(pos.reshape(d, ml, 3), sigma.reshape(d, ml),
              hardness_diag.reshape(d, ml),
              maskf.reshape(d, ml), chi, qtot, maskf)
