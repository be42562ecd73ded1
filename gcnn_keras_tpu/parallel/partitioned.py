"""Run the REAL model zoo on an edge-partitioned giant graph.

Round-2 proved the halo math on a hand-rolled SchNet clone
(``partitioned_model.py``, now deleted); this module replaces it with the
actual flax models: a partitioned graph is expressed as a *stacked*
``GraphBatch`` (leading device axis ``D``) whose static ``part_axis`` /
``halo_size`` / ``n_shards`` fields make every sender-side gather inside
``layers/aggr.py`` / ``layers/geometry.py`` read from the halo-exchanged
node table (``batch.sender_node_table``) — so ``models/schnet.py``,
``models/painn.py`` (and any zoo model built on those layers) run
UNMODIFIED on a graph sharded over the mesh.

Pieces:
- ``prepare_partitioned``: host-side locality-sorted block partition +
  automatic halo/all-gather strategy choice (moved from the deleted
  ``partitioned_model.py``; builds on ``edge_partition.py``).
- ``build_partitioned_batch``: stacked per-device ``GraphBatch``.
- ``make_partitioned_energy_force``: jitted shard_map'd energy+forces —
  energy is a psum OUTSIDE the differentiated region; the transposed
  ppermute/all-gather returns each neighbor's force contribution to the
  owning shard (no D-fold scaling, the round-2 lesson).
- ``make_partitioned_train_step``: a full optimizer step over the sharded
  graph. The energy-loss coefficient ``2 w_e (E - E_ref)`` is computed
  behind ``stop_gradient`` (its psum never enters the differentiated
  region); per-device surrogate gradients are psum'd — exact vs the
  single-device oracle by test.

The flagship HDNNP4th also runs partitioned (ACSF angle triples carry
halo-encoded neighbor ids; the Qeq charge solve is the ROW-SHARDED
matrix-free CG of ``layers/conv/qeq_solver.solve_qeq_rows_in_shard_map``):
energy, forces, charges, AND the full flagship loss (charge + energy +
force, reference force_hdnnp4th.py:228-245) all TRAIN with gradients
matching the dense-Qeq single-device oracle
(tests/test_partitioned_model.py). The force term's second order
(grad-of-grad THROUGH the distributed CG — r3's KNOWN LIMIT) is closed
by (a) a jax.custom_jvp on the sharded solve whose tangent rule
recursively solves the bordered tangent system (qeq_solver._qeq_rows_jvp),
(b) a custom_linear_solve CG with no rhs-derived solve constants
(qeq_solver._transposable_pcg), and (c) a reverse-over-FORWARD force-loss
gradient in the train step below.

No reference counterpart: kgcnn is strictly single-device and caps system
size in preprocessing instead (``kgcnn/graph/preprocessor.py:264-269``,
SURVEY §2.12 / §5 "long-context analog").
"""
from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..batch import GraphBatch, batch_graphs
from .edge_partition import (PartitionedGraph, encode_halo_senders,
                             partition_graph, required_halo_size)

Array = jax.Array


# --------------------------------------------------------- partitioning ---

class PartitionedInputs(NamedTuple):
    z: np.ndarray                # (D, N_loc) int32
    pos: np.ndarray              # (D, N_loc, 3) f32
    senders_idx: np.ndarray      # (D, E_loc) int32 — halo-buffer or GLOBAL ids
    receivers_local: np.ndarray  # (D, E_loc) int32, sorted per shard
    edge_mask: np.ndarray        # (D, E_loc) bool
    node_mask: np.ndarray        # (D, N_loc) bool
    order: np.ndarray            # new_id -> old_id permutation
    halo_size: int               # 0 => all-gather strategy
    remote_fraction: float       # achieved halo fraction (diagnostics)
    # optional: angle triples (HDNNP/ACSF) — center i LOCAL id, j/k in the
    # same encoding as senders_idx; sorted by center per shard
    angles_idx: Optional[np.ndarray] = None    # (D, A_loc, 3) int32
    angle_mask: Optional[np.ndarray] = None    # (D, A_loc) bool


def fit_halo(part: PartitionedGraph, round_to: int = 64,
             max_fraction: float = 0.5) -> int:
    """Auto-derive the halo size from the partition. Returns 0 (= use
    all-gather) when senders reach beyond ring neighbors or the required
    halo exceeds ``max_fraction`` of the local block (at that point the
    ppermute traffic approaches the all-gather's and loses its point)."""
    need = required_halo_size(part)
    if need < 0 or need > max_fraction * part.n_local:
        return 0
    return min(max(((need + round_to - 1) // round_to) * round_to, round_to),
               part.n_local)


def _angle_halo_need(new_ang: np.ndarray, n_loc: int) -> int:
    """Smallest halo covering every angle's j/k from the center's shard, or
    -1 if some neighbor lies beyond the ring neighbors."""
    if len(new_ang) == 0:
        return 0
    owner = new_ang[:, 0] // n_loc
    need = 0
    for col in (1, 2):
        rel = new_ang[:, col] - owner * n_loc
        if np.any(rel < -n_loc) or np.any(rel >= 2 * n_loc):
            return -1
        need = max(need, int(np.max(np.maximum(-rel, rel - n_loc + 1),
                                    initial=0)))
    return need


def prepare_partitioned(z: np.ndarray, pos: np.ndarray, senders: np.ndarray,
                        receivers: np.ndarray, n_devices: int,
                        locality_sort: bool = True,
                        angles: Optional[np.ndarray] = None
                        ) -> PartitionedInputs:
    """Host-side: locality-sorted block partition + automatic strategy
    choice (halo when the partition supports it, else all-gather).

    ``angles``: optional (A, 3) int (i, j, k) node triples (center i);
    each angle goes to its center's shard, and j/k are encoded like
    senders (halo-buffer or global ids)."""
    part = partition_graph(pos.astype(np.float32), senders, receivers,
                           n_devices, locality_sort=locality_sort,
                           positions=pos)
    n_loc = part.n_local
    n = len(z)
    z_pad = np.zeros(n_loc * n_devices, dtype=np.int32)
    z_pad[:n] = np.asarray(z, dtype=np.int32)[part.order]

    inv = np.empty(n, dtype=np.int64)
    inv[part.order] = np.arange(n)
    new_ang = (inv[np.asarray(angles, dtype=np.int64)]
               if angles is not None and len(angles) else
               np.zeros((0, 3), dtype=np.int64))

    # diagnostics: fraction of real edges whose sender is off-shard
    remote = 0
    total = 0
    for d in range(n_devices):
        s = part.senders_global[d][part.edge_mask[d]].astype(np.int64)
        lo = d * n_loc
        remote += int(np.sum((s < lo) | (s >= lo + n_loc)))
        total += len(s)
    remote_fraction = remote / max(total, 1)

    halo = fit_halo(part)
    if halo > 0 and angles is not None:
        # the halo must also cover every angle's j/k from the center's shard
        need_a = _angle_halo_need(new_ang, n_loc)
        need_e = required_halo_size(part)
        if need_a < 0 or max(need_a, need_e) > 0.5 * n_loc:
            halo = 0
        else:
            halo = min(max(((max(need_a, need_e) + 63) // 64) * 64, 64),
                       n_loc)
    if halo > 0:
        senders_idx, ok = encode_halo_senders(part, halo, n_devices)
        if not ok:
            # hard fallback — NEVER run with clipped (wrong) sender ids
            halo, senders_idx = 0, part.senders_global
    else:
        senders_idx = part.senders_global

    angles_idx = angle_mask = None
    if angles is not None:
        owner = (new_ang[:, 0] // n_loc if len(new_ang) else
                 np.zeros((0,), dtype=np.int64))
        per_shard = []
        a_loc = 128
        for d in range(n_devices):
            sel = new_ang[owner == d]
            i_loc = sel[:, 0] - d * n_loc
            if halo > 0:
                jk = sel[:, 1:] - d * n_loc + halo  # halo-buffer encoding
            else:
                jk = sel[:, 1:]                     # global (all-gather)
            o = np.argsort(i_loc, kind="stable")    # sorted pooling path
            per_shard.append((i_loc[o], jk[o]))
            a_loc = max(a_loc, len(sel))
        a_loc = ((a_loc + 127) // 128) * 128
        angles_idx = np.zeros((n_devices, a_loc, 3), dtype=np.int32)
        angle_mask = np.zeros((n_devices, a_loc), dtype=bool)
        for d, (i_loc, jk) in enumerate(per_shard):
            m = len(i_loc)
            angles_idx[d, :m, 0] = i_loc
            angles_idx[d, :m, 1:] = jk
            angle_mask[d, :m] = True
            # padding rows keep the center sort (max local id) and point
            # j/k at slot 0; ACSFG4 masks their contributions
            angles_idx[d, m:, 0] = n_loc - 1
    return PartitionedInputs(
        z=z_pad.reshape(n_devices, n_loc),
        pos=part.node_feats.astype(np.float32),
        senders_idx=senders_idx.astype(np.int32),
        receivers_local=part.receivers_local.astype(np.int32),
        edge_mask=part.edge_mask, node_mask=part.node_mask,
        order=part.order, halo_size=halo, remote_fraction=remote_fraction,
        angles_idx=angles_idx, angle_mask=angle_mask)


def build_partitioned_batch(pin: PartitionedInputs, axis: str = "data",
                            node_props: Optional[Dict[str, np.ndarray]] = None,
                            global_props: Optional[Dict[str, np.ndarray]] = None
                            ) -> GraphBatch:
    """Stacked (leading dim D) ``GraphBatch`` for one partitioned graph.

    Each shard is graph slot 0 of a 2-slot batch (slot 1 absorbs padding
    nodes); ``part_axis``/``halo_size``/``n_shards`` make the model zoo's
    sender gathers halo-aware. Padding edges CANNOT point at a dead node
    here (a shard's slots may all be real), so ``pool_edges_to_nodes``
    masks messages by ``edge_mask`` when ``part_axis`` is set.

    ``node_props``: extra per-node arrays in ORIGINAL node order (e.g.
    ``esp``), partitioned via ``shard_node_array``. ``global_props``:
    per-graph scalars (e.g. ``total_charge``), replicated on every shard
    in graph slot 0.
    """
    D, n_loc = pin.z.shape
    graph_id = np.where(pin.node_mask, 0, 1).astype(np.int32)
    node_loc = np.broadcast_to(
        np.arange(n_loc, dtype=np.int32)[None], (D, n_loc)).copy()
    graph_mask = np.broadcast_to(np.array([True, False])[None], (D, 2)).copy()
    nodes = {"node_number": pin.z, "node_coordinates": pin.pos}
    for k, v in (node_props or {}).items():
        nodes[k] = shard_node_array(pin, np.asarray(v))
    globals_ = {"graph_mask": graph_mask}
    for k, v in (global_props or {}).items():
        arr = np.zeros((D, 2) + np.shape(np.atleast_1d(v))[1:],
                       dtype=np.asarray(v, dtype=np.float32).dtype)
        arr[:, 0] = np.asarray(v)
        globals_[k] = arr
    return GraphBatch(
        nodes=nodes,
        edges={},
        globals=globals_,
        senders=pin.senders_idx,
        receivers=pin.receivers_local,
        graph_id=graph_id,
        node_loc=node_loc,
        node_mask=pin.node_mask,
        edge_mask=pin.edge_mask,
        angles=pin.angles_idx,
        angle_mask=pin.angle_mask,
        n_graphs=2,
        max_nodes=n_loc,
        part_axis=axis,
        halo_size=pin.halo_size,
        n_shards=D,
    )


def shard_node_array(pin: PartitionedInputs, arr: np.ndarray) -> np.ndarray:
    """Permute+pad a per-node array ``(N, ...)`` into the partition layout
    ``(D, N_loc, ...)`` (e.g. force targets)."""
    D, n_loc = pin.z.shape
    out = np.zeros((D * n_loc,) + arr.shape[1:], dtype=arr.dtype)
    out[:len(pin.order)] = np.asarray(arr)[pin.order]
    return out.reshape((D, n_loc) + arr.shape[1:])


def unshard_node_array(pin: PartitionedInputs, arr: np.ndarray) -> np.ndarray:
    """Inverse of ``shard_node_array``: ``(D, N_loc, ...) -> (N, ...)`` in
    ORIGINAL node order."""
    flat = np.asarray(arr).reshape((-1,) + arr.shape[2:])
    n = len(pin.order)
    out = np.zeros((n,) + flat.shape[1:], dtype=flat.dtype)
    out[pin.order] = flat[:n]
    return out


def single_graph_batch(z: np.ndarray, pos: np.ndarray, senders: np.ndarray,
                       receivers: np.ndarray, **kw) -> GraphBatch:
    """The single-device oracle's input: the same graph as one ordinary
    ``GraphBatch`` (edge convention: ``edge_indices[:, 0]`` receiver)."""
    g = {"node_number": np.asarray(z, np.int32),
         "node_coordinates": np.asarray(pos, np.float32),
         "edge_indices": np.stack([np.asarray(receivers),
                                   np.asarray(senders)], axis=1)}
    return batch_graphs([g], **kw)


# ------------------------------------------------------------ execution ---

def _local(stacked):
    return jax.tree.map(lambda x: x[0], stacked)


def _graph_energy_scaled(model, variables, lb: GraphBatch, pos: Array,
                         energy_key: str) -> Array:
    """E / n_shards — the differentiable per-shard energy share.

    The model's graph readout is REPLICATED (``pool_nodes_to_graph`` psums
    the pooled representation), so the consistent SPMD-AD quantity to
    differentiate is the replicated output divided by the shard count: with
    psum's self-transpose, every pre-pooling cotangent slice then arrives
    scaled exactly once (psum of D seeds of c/D = c), and replicated
    post-pooling parameter gradients sum to c across the final psum of
    per-device grads. Differentiating the raw replicated output instead
    D-fold-counts everything upstream of the pooling (the round-2 lesson,
    now pinned by tests/test_partitioned_model.py's oracle comparisons)."""
    out = model.apply(variables, lb.replace_nodes(node_coordinates=pos))
    return out[energy_key][0, 0] / lb.n_shards


def make_partitioned_energy_force(model, mesh: Mesh, axis: str = "data",
                                  energy_key: str = "output") -> Callable:
    """Jitted ``fn(variables, stacked_batch) -> (energy, forces (D,N_loc,3))``
    for a real flax zoo model on a partitioned graph.

    The model's graph readout returns the GLOBAL energy replicated on every
    shard; forces are the grad of E / n_shards (see
    ``_graph_energy_scaled``) and arrive on the owning shard via the
    transposed halo collectives."""

    def device_fn(variables, batch):
        lb = _local(batch)
        pos0 = lb.nodes["node_coordinates"]
        e_s, g = jax.value_and_grad(
            lambda p: _graph_energy_scaled(model, variables, lb, p,
                                           energy_key)
        )(pos0)
        return e_s * lb.n_shards, (-g)[None]

    fn = shard_map(device_fn, mesh=mesh, in_specs=(P(), P(axis)),
                   out_specs=(P(), P(axis)), check_vma=False)
    return jax.jit(fn)


def make_partitioned_train_step(model, mesh: Mesh, tx, axis: str = "data",
                                energy_key: str = "output",
                                w_energy: float = 1.0,
                                w_force: float = 1.0,
                                w_charge: float = 0.0) -> Callable:
    """Full charge+energy+force training step over the sharded giant graph:
    ``step(variables, opt_state, stacked_batch, e_ref, f_ref_stacked
    [, q_ref_stacked]) -> (variables, opt_state, metrics)``.

    Loss = w_e (E - E_ref)^2 + w_f mean_{n,xyz} (F - F_ref)^2
    + w_q mean_n (q - q_ref)^2 — the flagship HDNNP4th recipe
    (reference force_hdnnp4th.py:228-245 with weights 1/200/50).

    Gradient assembly never transposes a transposed program:

    - ENERGY: surrogate ``coeff * e_s`` with ``e_s = E / D`` (see
      ``_graph_energy_scaled``) and ``coeff = 2 w_e (E - E_ref)`` behind
      stop_gradient; psum'd per-device grads give exactly
      d/dtheta [w_e (E - E_ref)^2].
    - FORCE: reverse-over-FORWARD. dL_f/dtheta = d/dtheta <grad_pos E, v>
      with v = stop_grad(dL_f/dF) = -stop_grad(2 w_f (F - F_ref) m / 3N):
      the directional derivative h = jvp(pos -> E/D; v) is a REPLICATED
      scalar whose psum'd theta-grads equal d<grad_pos E, v>/dtheta — one
      jvp through the solve (custom_linear_solve's tangent rule: one more
      CG on a replicated rhs) followed by ONE reverse pass. The previous
      reverse-over-REVERSE formulation required the transpose of the
      distributed CG's transposed program, whose hand-reconciled
      replication bookkeeping (qeq_solver linear_call wrappers) is proven
      to first order only — and was measurably wrong at second order
      (grads off by 1e4x; tools/debug_partitioned_force_loss.py).
    - CHARGE: per-shard surrogate ``<q_loc, u>`` with
      u = stop_grad(2 w_q (q - q_ref) m / N) — a first-order reverse
      through the solve, the already-proven path.

    All three verified against the single-device dense-Qeq oracle in
    tests/test_partitioned_model.py."""

    def device_grads(variables, batch, e_ref, f_ref, q_ref):
        lb = _local(batch)
        f_ref_loc = f_ref[0]
        q_ref_loc = q_ref[0]
        pos0 = lb.nodes["node_coordinates"]
        mask = lb.node_mask.astype(jnp.float32)[:, None]
        n_tot = jax.lax.psum(jnp.sum(mask), axis)
        n_tot3 = n_tot * 3.0

        def e_and_q(vars_, p):
            out = model.apply(vars_, lb.replace_nodes(node_coordinates=p))
            e_s = out[energy_key][0, 0] / lb.n_shards
            q = out.get("charge")
            if q is not None:
                q = q.reshape(q.shape[0], -1)[:, 0]
            return e_s, q

        # pass 1 (fixed theta): E, F, q for the loss value and the
        # stop-gradient seed vectors
        (e_s, q_loc), g = jax.value_and_grad(
            lambda p: e_and_q(variables, p), has_aux=True)(pos0)
        f_pred = -g
        e = e_s * lb.n_shards
        coeff = jax.lax.stop_gradient(2.0 * w_energy * (e - e_ref))
        df = (f_pred - f_ref_loc) * mask
        lf_loc = w_force * jnp.sum(df * df) / n_tot3
        v = jax.lax.stop_gradient(-2.0 * w_force * df / n_tot3)
        if q_loc is not None:
            dq = (q_loc - q_ref_loc) * mask[:, 0]
            lq_loc = w_charge * jnp.sum(dq * dq) / n_tot
            u = jax.lax.stop_gradient(2.0 * w_charge * dq / n_tot)
        else:
            lq_loc = jnp.zeros(())

        def surrogate(vars_):
            if w_force:
                (e_s2, q2), (h, _) = jax.jvp(
                    lambda p: e_and_q(vars_, p), (pos0,), (v,))
            else:
                e_s2, q2 = e_and_q(vars_, pos0)
                h = 0.0
            s = coeff * e_s2 + h
            if w_charge and q2 is not None:
                s = s + jnp.sum(q2 * u)
            return s

        gv = jax.lax.psum(jax.grad(surrogate)(variables), axis)
        lf = jax.lax.psum(lf_loc, axis)
        lq = jax.lax.psum(lq_loc, axis)
        loss = w_energy * (e - e_ref) ** 2 + lf + lq
        metrics = {"loss": loss, "energy": e, "force_loss": lf,
                   "charge_loss": lq}
        return gv, metrics, f_pred[None]

    sm = shard_map(device_grads, mesh=mesh,
                   in_specs=(P(), P(axis), P(), P(axis), P(axis)),
                   out_specs=(P(), P(), P(axis)), check_vma=False)

    @jax.jit
    def _step(variables, opt_state, batch, e_ref, f_ref, q_ref):
        import optax
        gv, metrics, _ = sm(variables, batch, e_ref, f_ref, q_ref)
        updates, opt_state = tx.update(gv, opt_state, variables)
        variables = optax.apply_updates(variables, updates)
        return variables, opt_state, metrics

    def step(variables, opt_state, batch, e_ref, f_ref, q_ref=None):
        if q_ref is None:
            q_ref = jnp.zeros(f_ref.shape[:-1], f_ref.dtype)
        return _step(variables, opt_state, batch, e_ref, f_ref, q_ref)

    return step


def run_partitioned_energy_force(model, variables, pin: PartitionedInputs,
                                 mesh: Mesh, axis: str = "data",
                                 energy_key: str = "output"
                                 ) -> Tuple[float, np.ndarray]:
    """Convenience: build the stacked batch, place it, execute, and return
    ``(energy, forces (N, 3) in ORIGINAL node order)``."""
    batch = build_partitioned_batch(pin, axis=axis)
    sh = NamedSharding(mesh, P(axis))
    batch = jax.tree.map(lambda a: jax.device_put(jnp.asarray(a), sh), batch)
    fn = make_partitioned_energy_force(model, mesh, axis, energy_key)
    e, f = fn(variables, batch)
    return float(e), unshard_node_array(pin, np.asarray(f))
