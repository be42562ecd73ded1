"""Edge-partitioned message passing for graphs too large for one chip.

North-star capability (BASELINE.json): shard the NODES of one giant graph
across the mesh (block partition after a locality sort), assign every edge
to its receiver's shard, and run gather -> message -> segment-sum with the
sender features fetched across chips. No reference counterpart (the
reference is strictly single-device, SURVEY §2.12).

Two exchange strategies:
- ``all_gather``: sender features are all-gathered over ICI, then gathered
  locally — one fused XLA collective, optimal when the halo fraction is
  large or the partition has no locality.
- ``halo`` (ppermute): with a locality-sorted block partition, remote
  senders live almost exclusively on the ring neighbors; each device
  ppermutes its boundary slab to its neighbors and gathers from
  [left halo | local | right halo] — O(halo) traffic instead of O(N),
  overlappable with local aggregation by XLA's scheduler.

Host-side: ``partition_graph`` builds per-device local arrays with GLOBAL
sender indices (resolved against the all-gathered feature table), so the
device code is a plain gather + sorted segment-sum.
"""
from __future__ import annotations

from functools import partial
from typing import Callable, Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Array = jax.Array


class PartitionedGraph:
    """Host-side container: stacked per-device arrays (leading dim D)."""

    def __init__(self, node_feats, senders_global, receivers_local,
                 edge_mask, node_mask, n_local: int, order: np.ndarray):
        self.node_feats = node_feats          # (D, N_loc, F)
        self.senders_global = senders_global  # (D, E_loc) int32, PERMUTED ids
        self.receivers_local = receivers_local  # (D, E_loc) int32
        self.edge_mask = edge_mask            # (D, E_loc) bool
        self.node_mask = node_mask            # (D, N_loc) bool
        self.n_local = n_local
        self.order = order                    # permutation: new_id -> old_id


def partition_graph(node_feats: np.ndarray, senders: np.ndarray,
                    receivers: np.ndarray, n_devices: int,
                    locality_sort: bool = True,
                    positions: Optional[np.ndarray] = None) -> PartitionedGraph:
    """Block-partition nodes over devices; edges go to the receiver's shard.

    ``locality_sort`` orders nodes by a space-filling direction (first PCA
    axis of positions if given) so halo edges are mostly between neighboring
    shards.
    """
    n = node_feats.shape[0]
    if locality_sort and positions is not None:
        center = positions - positions.mean(0)
        u, s, vt = np.linalg.svd(center, full_matrices=False)
        order = np.argsort(center @ vt[0])
    else:
        order = np.arange(n)
    inv = np.empty(n, dtype=np.int64)
    inv[order] = np.arange(n)

    n_loc = (n + n_devices - 1) // n_devices
    n_pad = n_loc * n_devices
    feats = np.zeros((n_pad,) + node_feats.shape[1:], dtype=node_feats.dtype)
    feats[:n] = node_feats[order]
    node_mask = np.zeros(n_pad, dtype=bool)
    node_mask[:n] = True

    new_send = inv[senders]
    new_recv = inv[receivers]
    owner = new_recv // n_loc

    dev_edges: List[Tuple[np.ndarray, np.ndarray]] = []
    e_loc = 0
    for d in range(n_devices):
        sel = owner == d
        dev_edges.append((new_send[sel], new_recv[sel]))
        e_loc = max(e_loc, int(sel.sum()))
    e_loc = max(((e_loc + 127) // 128) * 128, 128)

    D = n_devices
    sg = np.zeros((D, e_loc), dtype=np.int32)
    rl = np.zeros((D, e_loc), dtype=np.int32)
    em = np.zeros((D, e_loc), dtype=bool)
    for d, (s_, r_) in enumerate(dev_edges):
        m = len(s_)
        # sort by local receiver for the sorted-segment fast path
        o = np.argsort(r_ % n_loc, kind="stable")
        sg[d, :m] = s_[o]
        rl[d, :m] = (r_ % n_loc)[o]
        em[d, :m] = True
        # padding edges aggregate into the last local slot with zero values
        rl[d, m:] = n_loc - 1
    return PartitionedGraph(
        node_feats=feats.reshape(D, n_loc, -1),
        senders_global=sg, receivers_local=rl, edge_mask=em,
        node_mask=node_mask.reshape(D, n_loc), n_local=n_loc, order=order)


def make_halo_aggregate(mesh: Mesh, halo_size: int,
                        message_fn: Optional[Callable] = None,
                        axis: str = "data") -> Callable:
    """ppermute halo-exchange variant: valid when every remote sender of a
    device's edges lies within ``halo_size`` rows of the neighboring shards'
    boundaries (guaranteed by a locality-sorted partition with
    ``validate_halo``). Sender ids must be pre-encoded as indices into the
    concatenated [left_halo | local | right_halo] buffer.
    """

    n_dev = mesh.shape[axis]  # static: ppermute perms must be concrete
    right = [(i, (i + 1) % n_dev) for i in range(n_dev)]
    left = [(i, (i - 1) % n_dev) for i in range(n_dev)]

    def device_fn(feats, senders_haloidx, recv_local, edge_mask):
        feats = feats[0]
        sg = senders_haloidx[0]
        rl = recv_local[0]
        em = edge_mask[0]
        from_left = jax.lax.ppermute(feats[-halo_size:], axis, right)
        from_right = jax.lax.ppermute(feats[:halo_size], axis, left)
        table = jnp.concatenate([from_left, feats, from_right], axis=0)
        xj = jnp.take(table, sg, axis=0)
        if message_fn is not None:
            xj = message_fn(xj)
        xj = xj * em[:, None].astype(xj.dtype)
        out = jax.ops.segment_sum(xj, rl, feats.shape[0],
                                  indices_are_sorted=True)
        return out[None]

    fn = shard_map(device_fn, mesh=mesh,
                   in_specs=(P(axis), P(axis), P(axis), P(axis)),
                   out_specs=P(axis), check_vma=False)
    return jax.jit(fn)


def required_halo_size(part: PartitionedGraph) -> int:
    """Smallest halo (rows from each ring neighbor) covering every real
    edge's sender, or -1 if some sender lies beyond the ±1 ring neighbors
    (then only the all-gather strategy is valid)."""
    n_loc = part.n_local
    need = 0
    for d in range(part.senders_global.shape[0]):
        lo = d * n_loc
        s = part.senders_global[d][part.edge_mask[d]].astype(np.int64)
        if s.size == 0:
            continue
        rel = s - lo
        if np.any(rel < -n_loc) or np.any(rel >= 2 * n_loc):
            return -1  # beyond ring neighbors — halo impossible
        need = max(need, int(np.max(np.maximum(-rel, rel - n_loc + 1),
                                    initial=0)))
    return need


def encode_halo_senders(part: PartitionedGraph, halo_size: int,
                        n_devices: int, strict: bool = False):
    """Re-encode global sender ids as [left_halo | local | right_halo]
    buffer indices per device. Returns (senders_haloidx (D, E_loc) int32,
    ok: bool) — ok False if some sender falls outside the halo; callers
    MUST then fall back to all-gather (out-of-halo senders are clipped to
    the buffer edge and would aggregate the WRONG feature). ``strict=True``
    raises instead of returning ok=False."""
    n_loc = part.n_local
    sg = part.senders_global
    out = np.zeros_like(sg)
    ok = True
    for d in range(n_devices):
        lo = d * n_loc
        s = sg[d].astype(np.int64)
        rel = s - lo  # position relative to local block start
        # local: [0, n_loc) -> halo buffer [halo, halo+n_loc)
        idx = rel + halo_size
        # left neighbor's tail: [-halo, 0) -> [0, halo)
        left = (rel < 0) & (rel >= -halo_size)
        idx = np.where(left, rel + halo_size, idx)
        # right neighbor's head: [n_loc, n_loc+halo) -> [halo+n_loc, ...)
        inside = (rel >= -halo_size) & (rel < n_loc + halo_size)
        if not np.all(inside | ~part.edge_mask[d]):
            ok = False
        idx = np.clip(idx, 0, n_loc + 2 * halo_size - 1)
        out[d] = idx
    if strict and not ok:
        raise ValueError(
            f"halo_size={halo_size} does not cover all senders "
            f"(need {required_halo_size(part)}); use all-gather instead")
    return out.astype(np.int32), ok


def make_partitioned_aggregate(mesh: Mesh, message_fn: Optional[Callable] = None,
                               axis: str = "data") -> Callable:
    """Build jitted distributed aggregation:
    ``fn(part: stacked arrays...) -> (D, N_loc, F)`` =
    for each local edge e: out[recv_local[e]] += message_fn(x[sender_global[e]]).

    ``message_fn(x_j, edge_slot)``: defaults to identity on gathered sender
    features.
    """

    def device_fn(feats, senders_global, recv_local, edge_mask):
        # leading device axis of size 1 inside shard_map
        feats = feats[0]          # (N_loc, F)
        sg = senders_global[0]
        rl = recv_local[0]
        em = edge_mask[0]
        # fetch all sender features over ICI
        all_feats = jax.lax.all_gather(feats, axis, tiled=True)  # (N_pad, F)
        xj = jnp.take(all_feats, sg, axis=0)
        if message_fn is not None:
            xj = message_fn(xj)
        xj = xj * em[:, None].astype(xj.dtype)
        out = jax.ops.segment_sum(xj, rl, feats.shape[0],
                                  indices_are_sorted=True)
        return out[None]

    fn = shard_map(device_fn, mesh=mesh,
                   in_specs=(P(axis), P(axis), P(axis), P(axis)),
                   out_specs=P(axis), check_vma=False)
    return jax.jit(fn)


def aggregate_partitioned(part: PartitionedGraph, mesh: Mesh,
                          message_fn: Optional[Callable] = None,
                          axis: str = "data") -> np.ndarray:
    """Convenience: run one distributed aggregation and return the flat
    (N, F) result in ORIGINAL node order."""
    fn = make_partitioned_aggregate(mesh, message_fn, axis)
    sharding = NamedSharding(mesh, P(axis))
    args = [jax.device_put(jnp.asarray(a), sharding) for a in
            (part.node_feats, part.senders_global, part.receivers_local,
             part.edge_mask)]
    out = np.asarray(fn(*args)).reshape(-1, part.node_feats.shape[-1])
    n = len(part.order)
    result = np.zeros((n, out.shape[-1]), dtype=out.dtype)
    result[part.order] = out[:n]
    return result
