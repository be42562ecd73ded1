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
        G = batch.n_graphs

        def ef(p):
            out = self.model.apply(
                variables, batch.replace_nodes(node_coordinates=p))
            e = out[self.energy_key]
            e = e.reshape(e.shape[0], -1)[:, 0]  # (G,)
            gmask = batch.globals["graph_mask"].astype(e.dtype)
            e = e * gmask
            # per-graph energies are independent (disjoint graphs), so one
            # reverse pass over the SUM yields every replica's forces at once
            return jnp.sum(e), e

        def efn(p):
            (_, e_g), g = jax.value_and_grad(ef, has_aux=True)(p)
            return e_g, -g

        def kinetic(vel):
            ke = 0.5 * jnp.sum(m * mask * vel * vel, axis=1)  # (N,)
            return jax.ops.segment_sum(ke, batch.graph_id, G)  # (G,)

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
        """Single-molecule trajectory (``e_pot``/``e_kin`` shape (steps,))."""
        system = {"node_number": np.asarray(node_number),
                  "node_coordinates": np.asarray(positions, np.float32)}
        if velocities is not None:
            system["velocities"] = np.asarray(velocities, np.float32)
        if masses is not None:
            system["masses"] = np.asarray(masses, np.float32)
        out = self.run_ensemble([system], n_segments)
        return {"pos": out["pos"][0], "vel": out["vel"][0],
                "e_pot": out["e_pot"][:, 0], "e_kin": out["e_kin"][:, 0],
                "edge_counts": out["edge_counts"],
                "n_shapes_compiled": out["n_shapes_compiled"]}

    def run_ensemble(self, systems, n_segments: int) -> Dict[str, Any]:
        """Many independent replicas integrated in the SAME scanned segment.

        Disjoint batching makes the replicas' forces exactly independent
        (one reverse pass over the summed energy), so S molecules cost one
        trajectory's dispatch — the production MD-screening configuration.
        ``systems``: list of dicts with ``node_number``, ``node_coordinates``
        and optional ``velocities`` / ``masses``. Returns per-replica
        ``pos``/``vel`` lists and ``e_pot``/``e_kin`` of shape (steps, S).
        """
        S = len(systems)
        zs = [np.asarray(s["node_number"]) for s in systems]
        ns = [z.shape[0] for z in zs]
        pos = [np.asarray(s["node_coordinates"], np.float32) for s in systems]
        vel = [np.asarray(s.get("velocities",
                                np.zeros((n, 3), np.float32)), np.float32)
               for s, n in zip(systems, ns)]
        masses = [np.asarray(s.get("masses", masses_from_numbers(z)),
                             np.float32) for s, z in zip(systems, zs)]
        offsets = np.concatenate([[0], np.cumsum(ns)]).astype(int)
        tot_n = int(offsets[-1])

        e_pot, e_kin, edge_counts = [], [], []
        for seg in range(n_segments):
            gs = []
            for z, p in zip(zs, pos):
                g = {"node_number": z, "node_coordinates": p}
                g.update(self.graph_extras)
                g = set_range(g, max_distance=self.max_distance + self.skin,
                              max_neighbours=self.max_neighbours)
                g["edge_indices"] = g.pop("range_indices")
                if self.with_angles:
                    from ..graph.preprocess import set_angle
                    g = set_angle(g, range_indices="edge_indices")
                gs.append(g)
            batch = batch_graphs(gs, global_keys=self.global_keys)
            edge_counts.append(int(np.asarray(batch.edge_mask).sum()))
            self._shapes_seen.add((batch.n_node, batch.n_edge))

            m_pad = np.ones((batch.n_node, 1), np.float32)
            pos_pad = np.zeros((batch.n_node, 3), np.float32)
            vel_pad = np.zeros((batch.n_node, 3), np.float32)
            for i, (o, n) in enumerate(zip(offsets[:-1], ns)):
                m_pad[o:o + n, 0] = masses[i]
                pos_pad[o:o + n] = pos[i]
                vel_pad[o:o + n] = vel[i]

            key = jax.random.fold_in(self._base_key, seg)
            p, v, ep, ek = self._runner(
                self.variables, batch, jnp.asarray(pos_pad),
                jnp.asarray(vel_pad), jnp.asarray(m_pad), key)
            p, v = np.asarray(p), np.asarray(v)
            pos = [p[o:o + n] for o, n in zip(offsets[:-1], ns)]
            vel = [v[o:o + n] for o, n in zip(offsets[:-1], ns)]
            e_pot.append(np.asarray(ep)[:, :S])
            e_kin.append(np.asarray(ek)[:, :S])

        return {"pos": pos, "vel": vel,
                "e_pot": np.concatenate(e_pot),
                "e_kin": np.concatenate(e_kin),
                "edge_counts": edge_counts,
                "n_shapes_compiled": len(self._shapes_seen)}
