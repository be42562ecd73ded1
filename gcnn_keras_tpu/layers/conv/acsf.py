"""Atom-centered symmetry functions (ACSF) G2/G4 — Behler descriptors.

Parity with ``kgcnn/layers/conv/acsf_conv.py:17`` (ACSFG2), ``:228`` (ACSFG4)
and ``:514`` (ACSFConstNormalization), re-designed for flat batches:

- per-edge element-pair parameter lookup is a gather from a small table;
- the per-neighbor-element sum is ONE segment-sum over the combined id
  ``receiver * num_relations + relation`` (no (N, R) scatter loops);
- everything is a fixed-shape elementwise pipeline the TPU VPU eats whole.

G2:  G_i = sum_{j != i} exp(-eta (r_ij - Rs)^2) * f_c(r_ij)   per (elem_j, set)
G4:  G_i = sum_{j,k} 2^{1-zeta} (1 + lambda cos theta_ijk)^zeta
           * exp(-eta (r_ij^2+r_ik^2+r_jk^2)) * f_c(r_ij) f_c(r_ik) f_c(r_jk)
           per (pair(elem_j, elem_k), set)
"""
from __future__ import annotations

import math
from typing import Any, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from ...batch import GraphBatch
from ...ops.segment import segment_sum

Array = jax.Array

_MAX_Z = 96


def _relational_pool(rep: Array, target: Array, relation: Array,
                     num_rel: int, n_node: int,
                     indices_are_sorted: bool = False,
                     expand_threshold: int = 16384,
                     max_lanes: int = 512) -> Array:
    """``out[n, r, m] = sum_{e: target=n, rel=r} rep[e, m]`` -> (N, R*m).

    Two layouts:
    - combined-key segment-sum over ``target * R + rel`` — compact, but the
      combined ids are UNSORTED (rel scrambles within a target), which
      forces XLA's serialized scatter;
    - on TPU with large inputs: one-hot EXPANSION ``(A, R*m)`` then a
      segment-sum over ``target`` alone — targets are sorted by batch
      construction (edges receiver-sorted; angles center-sorted), so this
      rides the sorted Pallas segment-sum. Extra bytes (R x) are cheap next
      to the scatter it replaces — measured 2.4x on the ACSF G4 forward.
    """
    m = rep.shape[-1]
    use_expand = (indices_are_sorted and num_rel * m <= max_lanes
                  and rep.shape[0] >= expand_threshold
                  and jax.default_backend() == "tpu")
    if use_expand:
        onehot = jax.nn.one_hot(relation, num_rel, dtype=rep.dtype)  # (A, R)
        rep_exp = (onehot[:, :, None] * rep[:, None, :]).reshape(
            rep.shape[0], num_rel * m)
        return segment_sum(rep_exp, target, n_node,
                           indices_are_sorted=True)
    combined = target * num_rel + relation
    pooled = segment_sum(rep, combined, n_node * num_rel)
    return pooled.reshape(n_node, num_rel * m)


def _reverse_mapping(element_mapping: np.ndarray) -> np.ndarray:
    rev = np.zeros(_MAX_Z, dtype=np.int32)
    for i, z in enumerate(element_mapping):
        rev[int(z)] = i
    return rev


def _cutoff_fc(r: Array, rc: Array) -> Array:
    """Cosine cutoff with the reference's clip semantics
    (``acsf_conv.py:164-169``): r clipped to [-rc, rc] so f_c(r>rc)=0."""
    shape = jnp.broadcast_shapes(r.shape, rc.shape)
    rclip = jnp.clip(jnp.broadcast_to(r, shape), -rc, rc)
    return 0.5 * (jnp.cos(rclip * math.pi / rc) + 1.0)


class ACSFG2(nn.Module):
    """Radial symmetry functions. Output ``(N, num_relations * m)``.

    ``eta_rs_rc``: (R, m, 3) shared or (R, R, m, 3) per-target-element table;
    ``element_mapping``: atomic numbers for the R element slots.
    """

    eta_rs_rc: Any
    element_mapping: Any
    add_eps: bool = False
    # fused Pallas path (ops/pallas/fused_g4.py G2 family) — same
    # AD-closed fwd/jvp/vjp structure and auto/force/off semantics as
    # ACSFG4.fused; additionally ineligible for periodic batches
    # (range_image lattice shifts stay on the unfused path)
    fused: Optional[bool] = None

    @staticmethod
    def make_param_table(eta: Sequence[float], rs: Sequence[float], rc: float,
                         elements: Sequence[int], **kwargs):
        """(parity: ``acsf_conv.py:128``) grid of (eta, Rs) pairs shared by
        every element."""
        table = [(et, r, rc) for r in rs for et in eta]
        elements = np.sort(np.array(elements))
        params = np.broadcast_to(np.array(table), (len(elements), len(table), 3))
        return {"eta_rs_rc": np.array(params), "element_mapping": elements, **kwargs}

    @nn.compact
    def __call__(self, batch: GraphBatch, z: Optional[Array] = None,
                 positions: Optional[Array] = None) -> Array:
        table = np.asarray(self.eta_rs_rc, dtype=np.float32)
        per_target = table.ndim == 4
        num_rel = table.shape[1] if per_target else table.shape[0]
        rev = _reverse_mapping(np.asarray(self.element_mapping))
        tab = jnp.asarray(table)
        rev = jnp.asarray(rev)

        z = z if z is not None else batch.nodes["node_number"].astype(jnp.int32)
        pos = positions if positions is not None else batch.nodes["node_coordinates"]

        if self.fused is not False:
            elems = np.asarray(self.element_mapping)
            periodic = ("range_image" in batch.edges
                        and "graph_lattice" in batch.globals)
            reasons = []
            if batch.part_axis is not None:
                reasons.append("edge-partitioned batch")
            if per_target:
                reasons.append("per-target parameter table")
            if periodic:
                reasons.append("periodic batch (range_image shifts)")
            if jax.default_backend() != "tpu":
                reasons.append("non-TPU backend")
            if not bool(np.all(table == table[0:1])):
                reasons.append("non-grid-constant parameter table")
            if num_rel * table.shape[-2] > 128:
                reasons.append(f"R*m={num_rel * table.shape[-2]} > 128")
            if table.shape[-2] > 8:
                reasons.append(f"m={table.shape[-2]} > 8 sets")
            if not batch.edge_window_local:
                reasons.append("edge index locality > 128 (node window "
                               "cannot cover the senders)")
            if not bool(np.all(np.diff(elems) > 0)):
                reasons.append("unsorted element_mapping")
            if self.fused and reasons:
                raise ValueError(
                    "ACSFG2(fused=True) but the configuration is not "
                    "eligible for the fused kernels: " + "; ".join(reasons))
            big_enough = bool(self.fused) or batch.senders.shape[0] >= 8192
            if not reasons and big_enough:
                from ...ops.pallas import fused_g4
                st = fused_g4.make_static_g2(table, self.element_mapping)
                return fused_g4.acsf_g2_fused(
                    pos, z.astype(jnp.int32), batch.senders,
                    batch.receivers, batch.edge_mask, st, batch.n_node,
                    batch.max_nodes)

        recv, send = batch.receivers, batch.senders
        # edge-partitioned shard: senders index the halo-exchanged tables
        from ...batch import sender_node_table
        z_tab = sender_node_table(batch, z)
        pos_tab = sender_node_table(batch, pos)
        zi = jnp.clip(z[recv], 0, _MAX_Z - 1)
        zj = jnp.clip(z_tab[send], 0, _MAX_Z - 1)
        zi_map = rev[zi]
        zj_map = rev[zj]
        params = tab[zi_map, zj_map] if per_target else tab[zj_map]  # (E, m, 3)
        eta, rs, rc = params[..., 0], params[..., 1], params[..., 2]

        vec = pos[recv] - pos_tab[send]
        if "range_image" in batch.edges and "graph_lattice" in batch.globals:
            image = batch.edges["range_image"].astype(pos.dtype)
            lat_e = batch.globals["graph_lattice"][batch.edge_graph_id]
            vec = vec + jnp.einsum("ei,eij->ej", image, lat_e)
        r2 = jnp.sum(vec * vec, axis=-1, keepdims=True)
        eps = 1e-12
        rij = jnp.sqrt(jnp.maximum(r2, eps))  # (E, 1)

        fc = _cutoff_fc(rij, rc)
        gij = jnp.exp(-eta * (rij - rs) ** 2)
        rep = gij * fc  # (E, m)
        rep = rep * batch.edge_mask[:, None].astype(rep.dtype)

        return _relational_pool(rep, recv, jnp.clip(zj_map, 0, num_rel - 1),
                                num_rel, batch.n_node,
                                indices_are_sorted=True)


class ACSFG4(nn.Module):
    """Angular symmetry functions over (i, j, k) node triples.
    Output ``(N, num_pair_relations * m)``.

    ``eta_zeta_lambda_rc``: (M, m, 4) shared or (R, M, m, 4) per-target table
    with M element-pair slots; pair index from (elem_j, elem_k), unordered
    unless ``keep_pair_order``.
    """

    eta_zeta_lambda_rc: Any
    element_mapping: Any
    element_pair_mapping: Any = None
    keep_pair_order: bool = False
    multiplicity: Optional[float] = None
    add_eps: bool = False
    # Fully fused Pallas path (ops/pallas/fused_g4.py): the whole
    # gather->geometry->transcendentals->expansion->pool pipeline in VMEM,
    # AD-closed (fwd/jvp/vjp kernels) so force training rides fused kernels
    # at every traversal — measured 1.62x on the FULL flagship HDNNP4th
    # train step (10.78 -> 6.67 ms, tools/ab_fused_g4_step.py; G4
    # force-traversal alone 5.14 -> 1.98 ms). None (default) = AUTO:
    # fused on TPU when eligible (shared grid-constant param table,
    # default pair mapping, R*m <= 128, m <= 8 sets, max_nodes <= 128,
    # single-device batch), unfused otherwise. True forces (raises if
    # ineligible); False forces the unfused path (f32-exact; the fused
    # kernels carry ~1e-5 bf16-split noise like the segment-sum default).
    fused: Optional[bool] = None

    @staticmethod
    def make_param_table(eta: Sequence[float], zeta: Sequence[float],
                         lamda: Sequence[float], rc: float,
                         elements: Sequence[int], **kwargs):
        """(parity: ``acsf_conv.py:388``)."""
        tab = [[et, zt, la, rc] for et in eta for zt in zeta for la in lamda]
        elements = np.sort(np.array(elements))
        n_pairs = len(elements) * (len(elements) + 1) // 2
        params = np.broadcast_to(np.array(tab), (n_pairs, len(tab), 4))
        return {"eta_zeta_lambda_rc": np.array(params), "element_mapping": elements,
                "element_pair_mapping": None, **kwargs}

    def _pair_maps(self):
        elements = np.asarray(self.element_mapping)
        if self.element_pair_mapping is None:
            idx = elements[:, None]
            pairs = np.concatenate([
                np.repeat(idx[None, :, :], len(elements), axis=0),
                np.repeat(idx[:, None, :], len(elements), axis=1)], axis=-1
            ).reshape(-1, 2)
            if not self.keep_pair_order:
                pairs = np.sort(pairs, axis=-1)
                pairs = pairs[np.sort(np.unique(pairs, axis=0, return_index=True)[1])]
        else:
            pairs = np.asarray(self.element_pair_mapping)
        rev_pair = np.zeros((_MAX_Z, _MAX_Z), dtype=np.int32)
        for i, (a, b) in enumerate(pairs):
            rev_pair[a, b] = i
            if not self.keep_pair_order:
                rev_pair[b, a] = i
        return pairs, rev_pair

    @nn.compact
    def __call__(self, batch: GraphBatch, z: Optional[Array] = None,
                 positions: Optional[Array] = None) -> Array:
        assert batch.angles is not None, "ACSFG4 needs angle triples in the batch"
        table = np.asarray(self.eta_zeta_lambda_rc, dtype=np.float32)
        per_target = table.ndim == 4
        num_rel = table.shape[1] if per_target else table.shape[0]
        pairs, rev_pair = self._pair_maps()
        assert pairs.shape[0] == num_rel, \
            f"pair table {pairs.shape[0]} != param relations {num_rel}"
        rev = jnp.asarray(_reverse_mapping(np.asarray(self.element_mapping)))
        rev_pair = jnp.asarray(rev_pair)
        tab = jnp.asarray(table)

        z = z if z is not None else batch.nodes["node_number"].astype(jnp.int32)
        pos = positions if positions is not None else batch.nodes["node_coordinates"]

        if self.fused is not False:
            grid = table.reshape(-1, table.shape[-2], 4)
            m_sets = table.shape[-2]
            elems = np.asarray(self.element_mapping)
            reasons = []
            if batch.part_axis is not None:
                reasons.append("edge-partitioned batch")
            if per_target:
                reasons.append("per-target parameter table")
            if self.element_pair_mapping is not None:
                reasons.append("custom element_pair_mapping")
            if jax.default_backend() != "tpu":
                reasons.append("non-TPU backend")
            if not bool(np.all(grid == grid[0:1])):
                reasons.append("non-grid-constant parameter table")
            if num_rel * m_sets > 128:
                reasons.append(f"R*m={num_rel * m_sets} > 128")
            if m_sets > 8:
                reasons.append(f"m={m_sets} > 8 sets")
            if not batch.angle_window_local:
                reasons.append("angle index locality > 128 (node window "
                               "cannot cover the neighbors)")
            if not bool(np.all(np.diff(elems) > 0)):
                # the fused in-kernel pair-slot formula assumes sorted
                # element slots (make_param_table sorts; hand-built
                # unsorted mappings would silently permute columns)
                reasons.append("unsorted element_mapping")
            if self.fused and reasons:
                raise ValueError(
                    "ACSFG4(fused=True) but the configuration is not "
                    "eligible for the fused kernels: " + "; ".join(reasons))
            # size gate (auto mode only): below ~8k angles the kernels'
            # fixed per-block costs beat the fusion win — measured 404 vs
            # 388 us/MD-step on a 1.3k-angle single-molecule trajectory
            # vs 1.62x at the 100k-angle flagship batch
            # 4096-angle gate (r5): a 520-atom single-molecule step
            # measured fused-G4 winning at 6.2k angles (3.18 -> 2.94 ms,
            # tools/qeq_crossover.py); the 1.3k-angle MD case still loses
            # (r4 addendum) — the crossover sits between.
            big_enough = bool(self.fused) or batch.angles.shape[0] >= 4096
            if not reasons and big_enough:
                from ...ops.pallas import fused_g4
                st = fused_g4.make_static(table, self.element_mapping,
                                          self.keep_pair_order,
                                          self.multiplicity)
                return fused_g4.acsf_g4_fused(
                    pos, z.astype(jnp.int32), batch.angles,
                    batch.angle_mask, st, batch.n_node, batch.max_nodes)

        i, j, k = batch.angles[:, 0], batch.angles[:, 1], batch.angles[:, 2]
        # edge-partitioned shard: the angle's center i is LOCAL, its
        # neighbors j/k are halo-table indices (parallel/partitioned.py)
        from ...batch import sender_node_table
        z_tab = sender_node_table(batch, z)
        pos_tab = sender_node_table(batch, pos)
        zi = jnp.clip(z[i], 0, _MAX_Z - 1)
        zj = jnp.clip(z_tab[j], 0, _MAX_Z - 1)
        zk = jnp.clip(z_tab[k], 0, _MAX_Z - 1)
        zi_map = rev[zi]
        zjk_map = rev_pair[zj, zk]
        params = tab[zi_map, zjk_map] if per_target else tab[zjk_map]  # (A, m, 4)
        eta, zeta, lamda, rc = (params[..., 0], params[..., 1],
                                params[..., 2], params[..., 3])

        eps = 1e-12
        pj, pk = pos_tab[j], pos_tab[k]
        vij = pj - pos[i]
        vik = pk - pos[i]
        vjk = pk - pj

        def dist(v):
            return jnp.sqrt(jnp.maximum(jnp.sum(v * v, axis=-1, keepdims=True), eps))

        rij, rik, rjk = dist(vij), dist(vik), dist(vjk)
        cos_theta = jnp.sum(vij * vik, axis=-1, keepdims=True) / rij / rik

        # The param table is usually a GRID (few unique eta / (zeta, lambda)
        # / rc values shared by all m sets x pair types): compute each
        # transcendental once per UNIQUE value and gather, instead of
        # (A, m)-broadcasting 6 exp/pow per set — the G4 forward is
        # transcendental-bound on the VPU (PERF.md r2).
        grid = table.reshape(-1, table.shape[-2], 4)  # (R(·T), m, 4)
        grid_constant = bool(np.all(grid == grid[0:1]))
        g0 = grid[0]                                   # (m, 4)
        uniq_eta, eta_inv = np.unique(g0[:, 0], return_inverse=True)
        uniq_zl, zl_inv = np.unique(g0[:, 1:3], axis=0, return_inverse=True)
        uniq_rc, rc_inv = np.unique(g0[:, 3], return_inverse=True)
        n_uniq = len(uniq_eta) + len(uniq_zl) + len(uniq_rc)

        if grid_constant and n_uniq < 2 * g0.shape[0]:
            # identical param grid for every pair/target (make_param_table's
            # meshgrid): compute each transcendental once per UNIQUE value;
            # per-set selection is a STATIC column pick (free), not a
            # data-dependent gather
            s2 = rij ** 2 + rik ** 2 + rjk ** 2                  # (A, 1)
            e_tab = jnp.exp(-jnp.asarray(uniq_eta)[None, :] * s2)  # (A, Ue)
            zs = jnp.asarray(uniq_zl[:, 0])[None, :]
            ls = jnp.asarray(uniq_zl[:, 1])[None, :]
            c_tab = jnp.power(2.0, 1.0 - zs) * jnp.power(
                jnp.maximum(cos_theta * ls + 1.0, 1e-30), zs)    # (A, Uzl)
            rcs = jnp.asarray(uniq_rc)[None, :]
            f_tab = (_cutoff_fc(rij, rcs) * _cutoff_fc(rik, rcs)
                     * _cutoff_fc(rjk, rcs))                     # (A, Urc)
            rep = (e_tab[:, eta_inv] * c_tab[:, zl_inv]
                   * f_tab[:, rc_inv])                           # (A, m)
            if self.multiplicity is not None:
                rep = rep / self.multiplicity
        else:
            fij = _cutoff_fc(rij, rc)
            fik = _cutoff_fc(rik, rc)
            fjk = _cutoff_fc(rjk, rc)
            gij = jnp.exp(-eta * rij**2)
            gik = jnp.exp(-eta * rik**2)
            gjk = jnp.exp(-eta * rjk**2)
            cos_term = jnp.power(jnp.maximum(cos_theta * lamda + 1.0, 1e-30),
                                 zeta)
            cos_term = jnp.power(2.0, 1.0 - zeta) * cos_term
            if self.multiplicity is not None:
                cos_term = cos_term / self.multiplicity
            rep = cos_term * gij * gik * gjk * fij * fik * fjk  # (A, m)
        rep = rep * batch.angle_mask[:, None].astype(rep.dtype)

        return _relational_pool(rep, i, jnp.clip(zjk_map, 0, num_rel - 1),
                                num_rel, batch.n_node,
                                indices_are_sorted=True)


class ACSFConstNormalization(nn.Module):
    """(x - mean) / std with constant tables (``acsf_conv.py:514``)."""

    std: Any = 1.0
    mean: Any = 0.0

    def __call__(self, x: Array) -> Array:
        return (x - jnp.asarray(self.mean, x.dtype)) / jnp.asarray(self.std, x.dtype)
