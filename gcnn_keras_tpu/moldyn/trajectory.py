"""Segmented scanned-MD driver: deployable trajectories on the chip.

Why this exists: host-driven MD (the reference plugs its calculator into
ASE's python-loop integrators, ``kgcnn/moldyn/ase_calc.py:75``) pays the
full model-dispatch latency EVERY step — ~10 ms/step through a tunneled
chip vs ~19 us of actual device compute for a 21-atom SchNet force
evaluation (PERF.md r3). The scanned integrators (``integrate.py``) remove
the dispatch but need a FIXED graph topology. This driver composes the two:

- K integrator steps inside ONE jitted ``lax.scan`` per SEGMENT,
- host re-neighboring between segments (``set_range``, which auto-
  dispatches to the native C++ cell list for large systems),
- bucketed padded shapes (``batch_graphs`` defaults) so recompiles are
  bounded the same way ``base.MolDynamicsModelPredictor`` bounds them,
- ONE jitted segment runner taking the batch as an ARGUMENT — same padded
  shapes hit the jit cache, so segment 2+ costs zero retracing.

A ``skin`` margin widens the neighbor cutoff at build time so pairs
entering the model cutoff mid-segment are already in the edge set; edges
carry real distances every step, so extra edges only add the basis tails
the model itself assigns them.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..batch import GraphBatch, batch_graphs
from ..graph.preprocess import set_range
from ..utils.constants import masses_from_numbers

Array = jax.Array


class ScannedMD:
    """Segmented on-device MD for ONE molecule.

    Parameters
    ----------
    model, variables: the energy model (flax module over GraphBatch) and its
        params; per-graph energy read from ``out[energy_key][0, 0]``.
    dt: integrator time step (unit system owned by the caller — masses,
        energies and coordinates must be consistent; with eV/A/amu the
        internal time unit is 10.1805 fs, as in ASE).
    segment_steps: scan length per segment (re-neighboring period).
    max_distance / max_neighbours: neighbor-list build (model cutoff).
    skin: extra cutoff margin at build time (see module docstring).
    thermostat: None (NVE velocity Verlet) or "langevin" (BAOAB; needs
        ``kT`` in model energy units and ``friction`` in 1/time).
    with_angles: also enumerate angle triples at every re-neighboring
        (``set_angle``) — required by ACSF-based potentials (HDNNP).
    graph_extras: extra host-side properties merged into the graph dict at
        every rebuild (e.g. ``total_charge``, ``esp``, ``esp_grad`` for the
        HDNNP4th electrostatics); names listed in ``global_keys`` become
        per-graph globals.
    """

    def __init__(self, model, variables, dt: float,
                 segment_steps: int = 100, max_distance: float = 4.0,
                 max_neighbours: int = 25, skin: float = 0.0,
                 thermostat: Optional[str] = None, kT: float = 0.0,
                 friction: float = 1.0, energy_key: str = "output",
                 seed: int = 0, with_angles: bool = False,
                 graph_extras: Optional[Dict[str, np.ndarray]] = None,
                 global_keys: tuple = ()):
        if thermostat not in (None, "langevin"):
            raise ValueError(f"unknown thermostat {thermostat!r}")
        if thermostat == "langevin" and kT <= 0:
            raise ValueError("langevin thermostat needs kT > 0")
        self.model = model
        self.variables = variables
        self.dt = float(dt)
        self.segment_steps = int(segment_steps)
        self.max_distance = float(max_distance)
        self.max_neighbours = int(max_neighbours)
        self.skin = float(skin)
        self.thermostat = thermostat
        self.kT = float(kT)
        self.friction = float(friction)
        self.energy_key = energy_key
        self.with_angles = with_angles
        self.graph_extras = dict(graph_extras or {})
        self.global_keys = tuple(global_keys)
        self._base_key = jax.random.PRNGKey(seed)
        self._runner = jax.jit(self._segment)
        self._shapes_seen = set()

    # -- one compiled segment ------------------------------------------------
    def _segment(self, variables, batch: GraphBatch, pos: Array, vel: Array,
                 m: Array, key: Array):
        dt = self.dt
        mask = batch.node_mask[:, None].astype(pos.dtype)

        def ef(p):
            out = self.model.apply(
                variables, batch.replace_nodes(node_coordinates=p))
            return out[self.energy_key][0, 0]

        def efn(p):
            e, g = jax.value_and_grad(ef)(p)
            return e, -g

        def kinetic(vel):
            return 0.5 * jnp.sum(m * mask * vel * vel)

        if self.thermostat == "langevin":
            c1 = jnp.asarray(np.exp(-self.friction * dt), pos.dtype)
            c2 = jnp.sqrt((1.0 - c1 * c1) * self.kT)

            def step(carry, k):
                p, v, f = carry
                v = v + 0.5 * dt * f / m
                p = p + 0.5 * dt * v * mask
                xi = jax.random.normal(k, p.shape, p.dtype)
                v = (c1 * v + c2 / jnp.sqrt(m) * xi) * mask
                p = p + 0.5 * dt * v * mask
                e, f_n = efn(p)
                f_n = f_n * mask
                v = v + 0.5 * dt * f_n / m
                return (p, v, f_n), (e, kinetic(v))

            xs = jax.random.split(key, self.segment_steps)
        else:
            def step(carry, _):
                p, v, f = carry
                v_h = v + 0.5 * dt * f / m
                p_n = p + dt * v_h * mask
                e, f_n = efn(p_n)
                f_n = f_n * mask
                v_n = v_h + 0.5 * dt * f_n / m
                return (p_n, v_n, f_n), (e, kinetic(v_n))

            xs = None

        _, f0 = efn(pos)
        (p, v, _), (e_pot, e_kin) = jax.lax.scan(
            step, (pos, vel * mask, f0 * mask), xs,
            length=self.segment_steps)
        return p, v, e_pot, e_kin

    # -- host loop -----------------------------------------------------------
    def run(self, node_number: np.ndarray, positions: np.ndarray,
            n_segments: int, velocities: Optional[np.ndarray] = None,
            masses: Optional[np.ndarray] = None) -> Dict[str, Any]:
        node_number = np.asarray(node_number)
        n = node_number.shape[0]
        pos = np.asarray(positions, np.float32)
        vel = (np.zeros_like(pos) if velocities is None
               else np.asarray(velocities, np.float32))
        if masses is None:
            masses = masses_from_numbers(node_number)
        masses = np.asarray(masses, np.float32)

        e_pot, e_kin, edge_counts = [], [], []
        for seg in range(n_segments):
            g = {"node_number": node_number, "node_coordinates": pos}
            g.update(self.graph_extras)
            g = set_range(g, max_distance=self.max_distance + self.skin,
                          max_neighbours=self.max_neighbours)
            g["edge_indices"] = g.pop("range_indices")
            if self.with_angles:
                from ..graph.preprocess import set_angle
                g = set_angle(g, range_indices="edge_indices")
            batch = batch_graphs([g], global_keys=self.global_keys)
            edge_counts.append(int(np.asarray(batch.edge_mask).sum()))
            self._shapes_seen.add((batch.n_node, batch.n_edge))

            m_pad = np.ones((batch.n_node, 1), np.float32)
            m_pad[:n, 0] = masses
            pos_pad = np.zeros((batch.n_node, 3), np.float32)
            pos_pad[:n] = pos
            vel_pad = np.zeros((batch.n_node, 3), np.float32)
            vel_pad[:n] = vel

            key = jax.random.fold_in(self._base_key, seg)
            p, v, ep, ek = self._runner(
                self.variables, batch, jnp.asarray(pos_pad),
                jnp.asarray(vel_pad), jnp.asarray(m_pad), key)
            pos = np.asarray(p)[:n]
            vel = np.asarray(v)[:n]
            e_pot.append(np.asarray(ep))
            e_kin.append(np.asarray(ek))

        return {"pos": pos, "vel": vel,
                "e_pot": np.concatenate(e_pot),
                "e_kin": np.concatenate(e_kin),
                "edge_counts": edge_counts,
                "n_shapes_compiled": len(self._shapes_seen)}
