"""4th-generation HDNNP electrostatics: charge equilibration (Qeq/CENT),
screened-Coulomb energies and QM/MM coupling.

Parity with ``kgcnn/layers/conv/hdnnp_conv.py`` (CENTCharge:15,
ElectrostaticEnergyGaussCharge:274, ElectrostaticQMMMEnergyPointCharge:446,
ElectrostaticQMMMForcePointCharge:516, CENTChargePlusElectrostaticEnergy:579).

TPU re-design of the Qeq solve: the reference scatters the Lagrange
row/column at per-molecule position ``num_atoms`` inside a padded matrix
(``hdnnp_conv.py:219-244``); here the constraint row/col sits at the FIXED
last slot M, with identity rows for padding atoms — identical solution,
fully static shapes, one batched ``jnp.linalg.solve`` on ``(G, M+1, M+1)``.
The solve is linear, so reverse-mode AD through it (for forces) uses the
implicit adjoint solve that jnp provides automatically.
"""
from __future__ import annotations

import math
from typing import Any, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from ...batch import GraphBatch, flat_to_padded, padded_to_flat
from ...ops.segment import segment_sum

Array = jax.Array

_MAX_Z = 97

# Covalent radii (pm) — CENTCharge table (``hdnnp_conv.py:85``), scaled
# pm -> Bohr by 0.0188973 for the Qeq solve.
_COVALENT_RADII_PM = np.array([
    0.0, 31, 28,
    128, 96, 84, 73, 71, 66, 57, 58,
    166, 141, 121, 111, 107, 105, 102, 106,
    203, 176, 170, 160, 153, 139, 139, 132, 126, 124, 132, 122, 122, 120, 119,
    120, 120, 116,
    220, 195, 190, 175, 164, 154, 147, 146, 142, 139, 145, 144, 142, 139, 139,
    138, 139, 140,
    244, 215, 207, 204, 203, 201, 199, 198, 198, 196, 194, 192, 192, 189, 190,
    187, 175, 187, 170, 162, 151, 144,
    141, 136, 136, 132, 145, 146, 148, 140, 150, 150,
    260, 221, 215, 206, 200, 196, 190, 187, 180, 169
])
CENT_RADII = (0.0188973 * _COVALENT_RADII_PM).astype(np.float32)
GAUSS_RADII = (0.01 * _COVALENT_RADII_PM).astype(np.float32)

# Chemical hardness (eV), scaled as in the reference (``hdnnp_conv.py:96``).
CENT_HARDNESS = (0.037 / 0.529177 * np.array([
    0.0, 6.2, 8.8,
    2.2, 4.6, 3.8, 4.7, 7.1, 5.6, 6.1, 9.1,
    2.1, 4.0, 2.6, 3.3, 4.7, 3.8, 4.5, 7.7,
    2.3, 3.2, 3.2, 2.9, 3.2, 3.4, 4.0, 3.6, 3.3, 3.3, 3.8, 5.8, 3.0, 3.3, 4.5,
    3.9, 4.2, 7.7,
    1.9, 3.1, 3.1, 2.9, 3.3, 3.5, 3.7, 3.7, 3.9, 4.1, 3.6, 5.4, 3.1, 3.1, 4.0,
    3.6, 3.8, 6.8,
    1.8, 2.7, 2.4, 2.3, 2.5, 2.7, 2.5, 3.0, 3.0, 3.2, 3.2, 3.3, 3.3, 3.3, 3.1,
    3.5, 3.2, 3.8, 3.1, 3.6, 3.7, 3.7,
    3.8, 3.5, 3.6, 5.8, 3.1, 3.4, 3.3, 3.6, 3.6, 6.1,
    1.8, 3.0, 2.8, 2.8, 3.1, 3.0, 3.1, 3.5, 3.3, 3.3
])).astype(np.float32)


def _table_init(table: np.ndarray, use_physical_params: bool):
    """Initializer for the (97,) hardness/sigma weights — physical table when
    ``use_physical_params`` (reference ``hdnnp_conv.py:142`` set_weights),
    otherwise glorot_uniform over the 1-D shape (keras fan = shape[0])."""
    if use_physical_params:
        return lambda key: jnp.asarray(table)
    limit = math.sqrt(6.0 / (len(table) + len(table)))
    return lambda key: jax.random.uniform(
        key, (len(table),), jnp.float32, -limit, limit)


class CENTCharge(nn.Module):
    """Charge equilibration: solve the Qeq linear system per molecule.

    Input: flat electronegativities ``chi (N,)``; uses ``node_number``,
    ``node_coordinates`` and ``globals['total_charge']``. Returns flat
    charges ``(N,)``.
    """

    param_trainable: bool = False
    # reference ``use_physical_params`` (hdnnp_conv.py:142): True seeds the
    # hardness/sigma weights with the physical tables, False leaves the
    # random (glorot_uniform) initialization in place.
    use_physical_params: bool = True
    # Qeq solver: "dense" = batched (G, M+1, M+1) LU (reference-equivalent),
    # "iterative" = matrix-free blockwise CG (O(M*block) memory — giant
    # molecules never materialize M^2; qeq_solver.py), "auto" = iterative
    # from ``iterative_threshold`` atoms up.
    solver: str = "auto"
    # dense-path implementation: "cholesky" (default) = SPD Cholesky +
    # Schur-eliminated constraint — identical solution (A/B losses equal
    # to f32 tolerance), no pivoting, measured 1.12x/1.29x/1.07x on the
    # full flagship/520-atom/2080-atom train steps (tools/
    # ab_qeq_cholesky.py, PERF.md r5); "lu" = the bordered (M+1) LU
    # (reference-exact formulation, kept for debugging).
    dense_impl: str = "cholesky"
    # Measured on the v5e (tools/qeq_crossover.py, r5): the batched dense
    # LU beats the sequential latency-bound CG chain 2.4x / 2.8x / 3.3x at
    # 520 / 1040 / 2080 atoms with identical losses — the crossover has
    # not been reached by any measured size. 4096 is conservative: beyond
    # it the per-molecule (M+1)^2 matrix and O(M^3) LU grow into real
    # costs and CG's O(M*block) memory is the point.
    iterative_threshold: int = 4096
    cg_tol: float = 1e-6

    @nn.compact
    def __call__(self, batch: GraphBatch, chi: Array,
                 positions: Optional[Array] = None) -> Array:
        if self.param_trainable or not self.use_physical_params:
            hardness = self.param("hardness_j",
                                  _table_init(CENT_HARDNESS, self.use_physical_params))
            sigma_t = self.param("sigma",
                                 _table_init(CENT_RADII, self.use_physical_params))
        else:
            hardness = jnp.asarray(CENT_HARDNESS)
            sigma_t = jnp.asarray(CENT_RADII)

        z = jnp.clip(batch.nodes["node_number"].astype(jnp.int32), 0, _MAX_Z - 1)
        pos = positions if positions is not None else batch.nodes["node_coordinates"]
        qtot = batch.globals.get("total_charge")
        if qtot is None:
            qtot = jnp.zeros((batch.n_graphs,), dtype=pos.dtype)
        qtot = qtot.reshape(batch.n_graphs, -1)[:, 0]

        if batch.part_axis is not None:
            # edge-partitioned shard of ONE giant molecule: row-sharded
            # matrix-free CG over the mesh axis (O(M^2/D) work per shard,
            # never a materialized M x M) — the distributed long-range
            # electrostatics the reference cannot express
            # (kgcnn/layers/conv/hdnnp_conv.py:250 is one dense LU).
            from .qeq_solver import solve_qeq_rows_in_shard_map
            sig = sigma_t[z]
            diag_val = hardness[z] + 1.0 / (sig * math.sqrt(math.pi) + 1e-12)
            maskf = batch.node_mask.astype(pos.dtype)
            diag = jnp.where(batch.node_mask, diag_val, 1.0)
            chi_flat = chi.reshape(chi.shape[0], -1)[:, 0]
            q = solve_qeq_rows_in_shard_map(
                pos, sig, diag, batch.node_mask, chi_flat, qtot[0],
                batch.part_axis, tol=self.cg_tol)
            return q * maskf

        G, M = batch.n_graphs, max(batch.max_nodes, 1)
        chi_flat = chi.reshape(chi.shape[0], -1)[:, 0]
        mask = flat_to_padded(batch.node_mask.astype(pos.dtype), batch)
        mb = mask.astype(bool)
        if M <= 512:
            # ONE packed flat->padded scatter instead of four (r5: each
            # (N,)-level scatter/gather costs ~100 us of latency per AD
            # traversal; z-table lookups resolve flat so the padded
            # tensors are slices of one (G, M, 6) cast). GATED to small
            # M: at giant single-molecule sizes the (M, M) erf broadcast
            # reading from channel-strided SLICES measured ~1.8x SLOWER
            # (2080 atoms: 16.2 -> 28.7 ms step) — there the four casts
            # are noise and contiguous per-quantity tensors win.
            flat_tab = jnp.concatenate(
                [pos, chi_flat[:, None], sigma_t[z][:, None],
                 hardness[z][:, None]], axis=1)                  # (N, 6)
            pad_tab = flat_to_padded(flat_tab, batch)            # (G, M, 6)
            x_pad = pad_tab[..., :3]
            chi_pad = pad_tab[..., 3]
            sig = pad_tab[..., 4]
            hard_pad = pad_tab[..., 5]
        else:
            x_pad = flat_to_padded(pos, batch)                   # (G, M, 3)
            chi_pad = flat_to_padded(chi_flat, batch)            # (G, M)
            sig = flat_to_padded(sigma_t[z], batch)              # (G, M)
            hard_pad = flat_to_padded(hardness[z], batch)        # (G, M)

        use_iterative = (self.solver == "iterative" or
                         (self.solver == "auto" and M >= self.iterative_threshold))
        if use_iterative:
            from .qeq_solver import solve_qeq_iterative_batch
            diag_val = hard_pad + 1.0 / (sig * math.sqrt(math.pi) + 1e-12)
            diag = jnp.where(mb, diag_val, 1.0)
            q_pad = solve_qeq_iterative_batch(
                x_pad, sig, diag, chi_pad * mask, qtot, mb, tol=self.cg_tol)
            q = padded_to_flat(q_pad, batch)
            return q * batch.node_mask.astype(q.dtype)

        diff = x_pad[:, :, None, :] - x_pad[:, None, :, :]
        dist = jnp.sqrt(jnp.maximum(jnp.sum(diff * diff, axis=-1), 1e-12))
        gamma = jnp.sqrt(sig[:, :, None] ** 2 + sig[:, None, :] ** 2 + 1e-12)
        off = jax.scipy.special.erf(dist / (gamma * math.sqrt(2.0))) / dist
        pair_mask = mb[:, :, None] & mb[:, None, :]
        eye = jnp.eye(M, dtype=bool)[None]
        a_core = jnp.where(pair_mask & ~eye, off, 0.0)
        diag_val = hard_pad + 1.0 / (sig * math.sqrt(math.pi) + 1e-12)
        # diagonal: physical value for real atoms, 1 for padding (identity row)
        diag = jnp.where(mb, diag_val, 1.0)
        a_core = a_core + diag[:, :, None] * eye

        # bordered corner: 0, or 1 for empty graphs (keeps the system
        # nonsingular)
        n_valid = jnp.sum(mask, axis=1)
        corner = jnp.where(n_valid > 0, 0.0, 1.0)
        if self.dense_impl == "cholesky":
            # SPD A + Schur-eliminated constraint: no pivoting, half the
            # factorization FLOPs (measured A/B vs the bordered LU in
            # tools/ab_qeq_cholesky.py; PERF.md r5)
            from .qeq_solver import solve_qeq_dense_cholesky
            q_core = solve_qeq_dense_cholesky(a_core, mask,
                                              chi_pad * mask, qtot, corner)
            q = padded_to_flat(q_core, batch)
            return q * batch.node_mask.astype(q.dtype)

        # "lu": the reference-equivalent bordered (G, M+1, M+1) system —
        # assembled only on this branch (dead work for the default)
        a = jnp.zeros((G, M + 1, M + 1), dtype=pos.dtype)
        a = a.at[:, :M, :M].set(a_core)
        a = a.at[:, :M, M].set(mask)
        a = a.at[:, M, :M].set(mask)
        a = a.at[:, M, M].set(corner)
        rhs = jnp.concatenate([chi_pad * mask, qtot[:, None]], axis=1)  # (G, M+1)
        q_pad = jnp.linalg.solve(a, rhs[..., None])[..., 0]             # (G, M+1)
        q = padded_to_flat(q_pad[:, :M], batch)
        return q * batch.node_mask.astype(q.dtype)


class ElectrostaticEnergyGaussCharge(nn.Module):
    """Screened-Coulomb energy of Gaussian charges over the edge list +
    self energy (``hdnnp_conv.py:274``). Returns per-graph energy (G, 1)."""

    multiplicity: float = 2.0
    param_trainable: bool = False
    use_physical_params: bool = True
    # standalone layer: Angstrom radii (hdnnp_conv.py:318 0.01*pm); the
    # fused CENT+electrostatic layer overrides with Bohr radii — in the
    # reference the fused class inherits (CENTCharge,
    # ElectrostaticEnergyGaussCharge) and the MRO resolves _default_radii to
    # CENTCharge's 0.0188973*pm table (hdnnp_conv.py:85,365), so the
    # electrostatic sigma is Bohr there. Verified against recorded weights
    # (tests/assets/ref_golden_hdnnp4th.npz w012).
    sigma_table: Any = None

    @nn.compact
    def __call__(self, batch: GraphBatch, q: Array,
                 positions: Optional[Array] = None) -> Array:
        table = np.asarray(GAUSS_RADII if self.sigma_table is None
                           else self.sigma_table)
        if self.param_trainable or not self.use_physical_params:
            sigma_t = self.param("sigma",
                                 _table_init(table, self.use_physical_params))
        else:
            sigma_t = jnp.asarray(table)
        z = jnp.clip(batch.nodes["node_number"].astype(jnp.int32), 0, _MAX_Z - 1)
        pos = positions if positions is not None else batch.nodes["node_coordinates"]
        qf = q.reshape(q.shape[0], -1)[:, 0]

        recv, send = batch.receivers, batch.senders
        from ...batch import graph_psum, sender_node_table
        # pack [pos | sigma | q] into ONE per-node table so each edge side
        # is a single row gather (and partitioned shards do ONE halo
        # exchange) instead of four 1-D gathers per AD traversal — the r5
        # post-solver profile showed ~16 x ~100 us flat edge gathers from
        # this path dominating the flagship step's tail (PERF.md r5)
        sigma_n = sigma_t[z]
        node_tab = jnp.concatenate(
            [pos, sigma_n[:, None], qf[:, None]], axis=1)       # (N, 5)
        if batch.part_axis is not None:
            tab_send = sender_node_table(batch, node_tab)
            er = jnp.take(node_tab, recv, axis=0)
            es = jnp.take(tab_send, send, axis=0)
        else:
            from ...ops.pallas.fused_aggregate import (
                gather_with_sorted_transpose)
            # receivers are sorted by the batching invariant (perm=None);
            # senders carry the build-time sorted perm for the backward —
            # and WITHOUT a recorded perm fall back to a plain take (an
            # unsorted-sender pallas transpose would mis-aggregate)
            perm = batch.edges.get("sender_perm")
            er = gather_with_sorted_transpose(node_tab, recv)
            es = gather_with_sorted_transpose(node_tab, send, perm) \
                if perm is not None else jnp.take(node_tab, send, axis=0)
        vec = er[:, :3] - es[:, :3]
        rij = jnp.sqrt(jnp.maximum(jnp.sum(vec * vec, axis=-1), 1e-12))
        gamma = jnp.sqrt(er[:, 3] ** 2 + es[:, 3] ** 2 + 1e-12)
        pair = er[:, 4] * es[:, 4] * jax.scipy.special.erf(
            rij / (gamma * math.sqrt(2.0))) / rij
        pair = pair * batch.edge_mask.astype(pair.dtype)
        e_pair = segment_sum(pair, batch.edge_graph_id, batch.n_graphs)
        if self.multiplicity:
            e_pair = e_pair / self.multiplicity

        self_e = jnp.where(sigma_n > 0, qf**2 / jnp.maximum(sigma_n, 1e-12), 0.0) \
            / (2.0 * math.sqrt(math.pi))
        self_e = self_e * batch.node_mask.astype(self_e.dtype)
        e_self = segment_sum(self_e, batch.graph_id, batch.n_graphs,
                             indices_are_sorted=True)
        return graph_psum(batch, e_pair + e_self)[:, None]


def electrostatic_qmmm_energy(batch: GraphBatch, q: Array, esp: Array) -> Array:
    """E = sum_i q_i Phi_i per graph (``hdnnp_conv.py:446``). Returns (G, 1)."""
    from ...batch import graph_psum
    qf = q.reshape(q.shape[0], -1)[:, 0]
    ef = esp.reshape(esp.shape[0], -1)[:, 0]
    contrib = qf * ef * batch.node_mask.astype(qf.dtype)
    return graph_psum(batch, segment_sum(
        contrib, batch.graph_id, batch.n_graphs,
        indices_are_sorted=True))[:, None]


def electrostatic_qmmm_force(q: Array, esp_grad: Array) -> Array:
    """F_i = -q_i * dPhi_i/dr_i (``hdnnp_conv.py:516``). Returns (N, 3)."""
    qf = q.reshape(q.shape[0], -1)[:, 0]
    return -qf[:, None] * esp_grad


class CENTChargePlusElectrostaticEnergy(nn.Module):
    """Fused Qeq solve + electrostatic energy (``hdnnp_conv.py:579``).
    Returns (charges (N,), energy (G, 1))."""

    multiplicity: float = 2.0
    param_trainable: bool = False
    use_physical_params: bool = True
    solver: str = "auto"
    dense_impl: str = "cholesky"
    cg_tol: float = 1e-6

    @nn.compact
    def __call__(self, batch: GraphBatch, chi: Array,
                 positions: Optional[Array] = None) -> Tuple[Array, Array]:
        q = CENTCharge(param_trainable=self.param_trainable,
                       use_physical_params=self.use_physical_params,
                       solver=self.solver, dense_impl=self.dense_impl,
                       cg_tol=self.cg_tol,
                       name="cent_charge")(batch, chi, positions)
        e = ElectrostaticEnergyGaussCharge(
            multiplicity=self.multiplicity,
            param_trainable=self.param_trainable,
            use_physical_params=self.use_physical_params,
            # fused layer uses the CENT (Bohr) radii for sigma — reference
            # MRO quirk, see ElectrostaticEnergyGaussCharge.sigma_table
            sigma_table=CENT_RADII,
            name="electrostatic_energy")(batch, q, positions)
        return q, e
