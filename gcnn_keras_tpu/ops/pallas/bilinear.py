"""AD-closed bilinear message-passing primitives.

The cfconv hot chain ``out[r] = sum_e x[send[e]] * filt[e]`` (reference
surface: ``kgcnn/layers/gather.py:83`` + ``kgcnn/layers/pooling.py:37-79``)
is BILINEAR in (x, filt). The fused Pallas kernel
(``fused_aggregate.fused_gather_mul_segsum``) wins the forward but lost in
training because its ``custom_vjp`` backward was plain-XLA gather/scatter
(PERF.md r2): force training runs ~4 AD traversals per step and only one of
them rode the kernel.

This module closes the family under autodiff instead. Two JAX primitives:

- ``gms_p``   : (x (N,F), m (E,F)) -> (N,F)   out[s] = sum_{sidx[e]=s} x[gidx[e]] * m[e]
- ``sddmm_p`` : (a (N,F), b (N,F)) -> (E,F)   out[e] = a[ia[e]] * b[ib[e]]

with mutually-recursive JVP + transpose rules (the same mechanism that
makes ``lax.dot_general`` infinitely differentiable):

- d(gms)/dx transposes to another ``gms`` on sender-sorted edges (the
  build-time ``sender_perm`` re-sorts, so the Pallas kernel's sorted-segment
  requirement holds on BOTH sides);
- d(gms)/dm transposes to ``sddmm``;
- d(sddmm)/da and /db transpose back to ``gms``.

Every application in every traversal of a force-training step (forward,
force grad, loss double-backward) is therefore one of these two primitives,
each lowered to the fused Pallas kernel on TPU (``gms``) or an XLA
gather-product (``sddmm``; SDDMM kernel is a follow-up) — no serialized
XLA scatter anywhere.

Index invariants (GraphBatch): ``sidx`` ascending (edges sorted by receiver
at build), ``gperm`` a permutation making ``gidx`` ascending
(``batch.edges['sender_perm']``), and both endpoints of an edge live in the
same graph so the Pallas kernel's node-window gather covers every row.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.extend.core import Primitive
from jax.interpreters import ad, mlir
from jax.custom_derivatives import linear_call

Array = jax.Array

# Pallas dispatch threshold: below this the XLA chain wins (kernel ramp-up).
MIN_EDGES_PALLAS = 16384


def _invert_perm(perm: Array) -> Array:
    e = perm.shape[0]
    return jnp.zeros((e,), jnp.int32).at[perm].set(
        jnp.arange(e, dtype=jnp.int32), unique_indices=True)


def _permute_rows(vals: Array, perm: Array, inv: Array) -> Array:
    """Row permutation whose transpose is the inverse permutation (a take,
    not a scatter). Linear -> ``linear_call`` gives arbitrary-order AD."""

    def fwd(res, v):
        p, _ = res
        return jnp.take(v, p, axis=0)

    def trans(res, ct):
        _, i = res
        return jnp.take(ct, i, axis=0)

    return linear_call(fwd, trans, (perm, inv), vals)


# ---------------------------------------------------------------------------
# gms: out[s] = sum_{e: sidx[e]=s} x[gidx[e]] * m[e]
# ---------------------------------------------------------------------------

gms_p = Primitive("gnn_gather_mul_segsum")
sddmm_p = Primitive("gnn_sddmm")


def gms(x: Array, m: Array, gidx: Array, sidx: Array, gperm: Array,
        *, max_nodes: int, exact: bool = False) -> Array:
    """Fused gather-multiply-segment-sum with AD-closed derivatives.

    ``sidx`` must be ascending; ``gperm`` a permutation sorting ``gidx``;
    ``max_nodes`` the max nodes per graph (window bound for the kernel).
    """
    return gms_p.bind(x, m, gidx.astype(jnp.int32), sidx.astype(jnp.int32),
                      gperm.astype(jnp.int32),
                      n_out=x.shape[0], max_nodes=int(max_nodes),
                      exact=bool(exact))


def sddmm(a: Array, b: Array, ia: Array, ib: Array, ib_perm: Array,
          *, max_nodes: int, exact: bool = False) -> Array:
    """out[e] = a[ia[e]] * b[ib[e]] with AD-closed derivatives.

    ``ia`` must be ascending; ``ib_perm`` a permutation sorting ``ib``."""
    return sddmm_p.bind(a, b, ia.astype(jnp.int32), ib.astype(jnp.int32),
                        ib_perm.astype(jnp.int32),
                        max_nodes=int(max_nodes), exact=bool(exact))


# --- reference (XLA) implementations; also the non-TPU lowering -----------

def _gms_xla(x, m, gidx, sidx, gperm, *, n_out, max_nodes, exact):
    del gperm, max_nodes, exact
    xj = jnp.take(x, gidx, axis=0)
    return jax.ops.segment_sum(xj * m, sidx, n_out, indices_are_sorted=True)


def _sddmm_xla(a, b, ia, ib, ib_perm, *, max_nodes, exact):
    del ib_perm, max_nodes, exact
    return jnp.take(a, ia, axis=0) * jnp.take(b, ib, axis=0)


def _gms_tpu(x, m, gidx, sidx, gperm, *, n_out, max_nodes, exact):
    e = m.shape[0]
    use_pallas = (m.ndim == 2 and x.ndim == 2
                  and x.dtype == jnp.float32 and m.dtype == jnp.float32
                  and e >= MIN_EDGES_PALLAS and max_nodes > 0)
    if not use_pallas:
        return _gms_xla(x, m, gidx, sidx, gperm,
                        n_out=n_out, max_nodes=max_nodes, exact=exact)
    from .fused_aggregate import _fused_gather_mul_segsum
    return _fused_gather_mul_segsum(x, m, gidx, sidx, num_segments=n_out,
                                    max_nodes=max_nodes, exact=exact)


# --- abstract eval ---------------------------------------------------------

def _gms_abstract(x, m, gidx, sidx, gperm, *, n_out, max_nodes, exact):
    del gidx, sidx, gperm, max_nodes, exact
    return jax.core.ShapedArray((n_out,) + m.shape[1:],
                                jnp.result_type(x.dtype, m.dtype))


def _sddmm_abstract(a, b, ia, ib, ib_perm, *, max_nodes, exact):
    del ib, ib_perm, max_nodes, exact
    return jax.core.ShapedArray((ia.shape[0],) + a.shape[1:],
                                jnp.result_type(a.dtype, b.dtype))


gms_p.def_abstract_eval(_gms_abstract)
sddmm_p.def_abstract_eval(_sddmm_abstract)
gms_p.def_impl(functools.partial(jax.jit(_gms_xla, static_argnames=(
    "n_out", "max_nodes", "exact"))))
sddmm_p.def_impl(functools.partial(jax.jit(_sddmm_xla, static_argnames=(
    "max_nodes", "exact"))))

mlir.register_lowering(gms_p, mlir.lower_fun(_gms_xla, multiple_results=False))
mlir.register_lowering(gms_p, mlir.lower_fun(_gms_tpu, multiple_results=False),
                       platform="tpu")
mlir.register_lowering(sddmm_p,
                       mlir.lower_fun(_sddmm_xla, multiple_results=False))


# --- JVP rules: bilinear, so dy = F(dx, m) + F(x, dm) ----------------------

def _gms_jvp(primals, tangents, *, n_out, max_nodes, exact):
    x, m, gidx, sidx, gperm = primals
    dx, dm = tangents[0], tangents[1]
    out = gms_p.bind(x, m, gidx, sidx, gperm,
                     n_out=n_out, max_nodes=max_nodes, exact=exact)
    parts = []
    if not isinstance(dx, ad.Zero):
        parts.append(gms_p.bind(dx, m, gidx, sidx, gperm,
                                n_out=n_out, max_nodes=max_nodes, exact=exact))
    if not isinstance(dm, ad.Zero):
        parts.append(gms_p.bind(x, dm, gidx, sidx, gperm,
                                n_out=n_out, max_nodes=max_nodes, exact=exact))
    if not parts:
        return out, ad.Zero.from_primal_value(out)
    return out, functools.reduce(jnp.add, parts)


def _sddmm_jvp(primals, tangents, *, max_nodes, exact):
    a, b, ia, ib, ib_perm = primals
    da, db = tangents[0], tangents[1]
    out = sddmm_p.bind(a, b, ia, ib, ib_perm, max_nodes=max_nodes, exact=exact)
    parts = []
    if not isinstance(da, ad.Zero):
        parts.append(sddmm_p.bind(da, b, ia, ib, ib_perm,
                                  max_nodes=max_nodes, exact=exact))
    if not isinstance(db, ad.Zero):
        parts.append(sddmm_p.bind(a, db, ia, ib, ib_perm,
                                  max_nodes=max_nodes, exact=exact))
    if not parts:
        return out, ad.Zero.from_primal_value(out)
    return out, functools.reduce(jnp.add, parts)


ad.primitive_jvps[gms_p] = _gms_jvp
ad.primitive_jvps[sddmm_p] = _sddmm_jvp


# --- transpose rules: stay inside the family -------------------------------

def _gms_transpose(ct, x, m, gidx, sidx, gperm, *, n_out, max_nodes, exact):
    # Exactly one of x, m is linear (the JVP rule splits the two terms).
    if isinstance(ct, ad.Zero):
        zero = ad.Zero(x.aval if ad.is_undefined_primal(x) else m.aval)
        return ((zero, None, None, None, None)
                if ad.is_undefined_primal(x)
                else (None, zero, None, None, None))
    if ad.is_undefined_primal(x):
        # ct_x[n] = sum_{e: gidx[e]=n} ct[sidx[e]] * m[e]
        # Re-sort edges by gidx via gperm: the scatter side becomes sorted,
        # the gather side (sidx o gperm) stays graph-local -> same kernel.
        inv = _invert_perm(gperm)
        ct_x = gms_p.bind(ct, _permute_rows(m, gperm, inv),
                          jnp.take(sidx, gperm), jnp.take(gidx, gperm), inv,
                          n_out=x.aval.shape[0], max_nodes=max_nodes,
                          exact=exact)
        return ct_x, None, None, None, None
    # ct_m[e] = ct[sidx[e]] * x[gidx[e]]
    ct_m = sddmm_p.bind(ct, x, sidx, gidx, gperm,
                        max_nodes=max_nodes, exact=exact)
    return None, ct_m, None, None, None


def _sddmm_transpose(ct, a, b, ia, ib, ib_perm, *, max_nodes, exact):
    if isinstance(ct, ad.Zero):
        zero = ad.Zero(a.aval if ad.is_undefined_primal(a) else b.aval)
        return ((zero, None, None, None, None)
                if ad.is_undefined_primal(a)
                else (None, zero, None, None, None))
    if ad.is_undefined_primal(a):
        # ct_a[n] = sum_{e: ia[e]=n} ct[e] * b[ib[e]]  (ia already sorted)
        ct_a = gms_p.bind(b, ct, ib, ia, ib_perm,
                          n_out=a.aval.shape[0], max_nodes=max_nodes,
                          exact=exact)
        return ct_a, None, None, None, None
    # ct_b[n] = sum_{e: ib[e]=n} ct[e] * a[ia[e]] — sort edges by ib first.
    inv = _invert_perm(ib_perm)
    ct_b = gms_p.bind(a, _permute_rows(ct, ib_perm, inv),
                      jnp.take(ia, ib_perm), jnp.take(ib, ib_perm), inv,
                      n_out=b.aval.shape[0], max_nodes=max_nodes, exact=exact)
    return None, ct_b, None, None, None


ad.primitive_transposes[gms_p] = _gms_transpose
ad.primitive_transposes[sddmm_p] = _sddmm_transpose


# --- GraphBatch-level entry ------------------------------------------------

def bilinear_gather_mul_segsum(x: Array, m: Array, senders: Array,
                               receivers: Array, sender_perm: Array,
                               max_nodes: int, exact: bool = False) -> Array:
    """``out[r] = sum_{e: recv[e]=r} x[send[e]] * m[e]`` for receiver-sorted
    edges, with EVERY autodiff traversal (any order) staying on the fused
    Pallas kernels. Use where both x and m require gradients (training)."""
    return gms(x, m, senders, receivers, sender_perm,
               max_nodes=max_nodes, exact=exact)
