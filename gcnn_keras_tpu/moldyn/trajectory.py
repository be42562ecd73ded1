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
        self._sharded_runners: Dict[int, Any] = {}
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

    def _make_sharded(self, n_devices: int):
        """Replica-DP runner: each mesh device integrates its own chunk of
        the ensemble (its own disjoint batch) inside shard_map — replicas
        are independent, so there are no collectives at all; the mesh just
        multiplies MD throughput."""
        from jax.sharding import Mesh, PartitionSpec as P

        devs = jax.devices()
        if n_devices > len(devs):
            raise ValueError(f"n_devices={n_devices} > available {len(devs)}")
        mesh = Mesh(np.array(devs[:n_devices]), ("dp",))

        def inner(variables, batch, pos, vel, m, key):
            b = jax.tree.map(lambda a: a[0], batch)
            p, v, ep, ek = self._segment(variables, b, pos[0], vel[0],
                                         m[0], key[0])
            return p[None], v[None], ep[None], ek[None]

        f = jax.shard_map(
            inner, mesh=mesh,
            in_specs=(P(), P("dp"), P("dp"), P("dp"), P("dp"), P("dp")),
            out_specs=(P("dp"), P("dp"), P("dp"), P("dp")),
            check_vma=False)
        return jax.jit(f)

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

    def run_ensemble(self, systems, n_segments: int,
                     n_devices: Optional[int] = None) -> Dict[str, Any]:
        """Many independent replicas integrated in the SAME scanned segment.

        Disjoint batching makes the replicas' forces exactly independent
        (one reverse pass over the summed energy), so S molecules cost one
        trajectory's dispatch — the production MD-screening configuration.
        ``systems``: list of dicts with ``node_number``, ``node_coordinates``
        and optional ``velocities`` / ``masses`` (any other keys are merged
        into the graph dict, e.g. per-molecule ``total_charge``/``esp``).
        ``n_devices``: shard the ensemble over a device mesh (replica data
        parallelism — no collectives, each device integrates its contiguous
        chunk; requires S divisible by n_devices). Returns per-replica
        ``pos``/``vel`` lists and ``e_pot``/``e_kin`` of shape (steps, S).
        """
        S = len(systems)
        D = int(n_devices) if n_devices else 1
        if S % D != 0:
            raise ValueError(f"{S} replicas not divisible by "
                             f"n_devices={D}")
        chunk = S // D
        zs = [np.asarray(s["node_number"]) for s in systems]
        ns = [z.shape[0] for z in zs]
        pos = [np.asarray(s["node_coordinates"], np.float32) for s in systems]
        vel = [np.asarray(s.get("velocities",
                                np.zeros((n, 3), np.float32)), np.float32)
               for s, n in zip(systems, ns)]
        masses = [np.asarray(s.get("masses", masses_from_numbers(z)),
                             np.float32) for s, z in zip(systems, zs)]
        extras = [{k: v for k, v in s.items()
                   if k not in ("node_number", "node_coordinates",
                                "velocities", "masses")} for s in systems]

        e_pot, e_kin, edge_counts = [], [], []
        for seg in range(n_segments):
            gs = []
            for i, (z, p, ex) in enumerate(zip(zs, pos, extras)):
                g = {"node_number": z, "node_coordinates": p}
                g.update(self.graph_extras)
                g.update(ex)
                if "graph_lattice" in g:
                    # periodic system: wrap into the cell before the
                    # neighbor build (images handle the rest); the model's
                    # range_image/graph_lattice path owns the shifts
                    lat = np.asarray(g["graph_lattice"], np.float32)
                    frac = np.asarray(p, np.float64) @ np.linalg.inv(lat)
                    p = (np.mod(frac, 1.0) @ lat).astype(np.float32)
                    pos[i] = p
                    g["node_coordinates"] = p
                    from ..graph.preprocess import set_range_periodic
                    g = set_range_periodic(
                        g, max_distance=self.max_distance + self.skin,
                        max_neighbours=self.max_neighbours)
                else:
                    g = set_range(g,
                                  max_distance=self.max_distance + self.skin,
                                  max_neighbours=self.max_neighbours)
                g["edge_indices"] = g.pop("range_indices")
                if self.with_angles:
                    from ..graph.preprocess import set_angle
                    g = set_angle(g, range_indices="edge_indices")
                gs.append(g)

            # per-device groups must share ONE padded shape (shard_map
            # requires uniform shards); take the max bucket over groups
            groups = [gs[d * chunk:(d + 1) * chunk] for d in range(D)]
            from ..batch import bucket_size
            pads = {}
            if D > 1:
                pads["n_node_pad"] = bucket_size(max(
                    sum(g["node_coordinates"].shape[0] for g in grp)
                    for grp in groups) + 1)
                pads["n_edge_pad"] = bucket_size(max(
                    sum(g["edge_indices"].shape[0] for g in grp)
                    for grp in groups) or 1)
                pads["max_nodes"] = max(g["node_coordinates"].shape[0]
                                        for g in gs)
                if self.with_angles:
                    pads["n_angle_pad"] = bucket_size(max(
                        sum(g["angle_indices_nodes"].shape[0] for g in grp)
                        for grp in groups) or 1)

            batches = [batch_graphs(grp, global_keys=self.global_keys,
                                    **pads) for grp in groups]
            batch0 = batches[0]
            edge_counts.append(sum(int(np.asarray(b.edge_mask).sum())
                                   for b in batches))
            self._shapes_seen.add((D, batch0.n_node, batch0.n_edge))

            m_pads, pos_pads, vel_pads = [], [], []
            for d, grp in enumerate(groups):
                cns = ns[d * chunk:(d + 1) * chunk]
                offs = np.concatenate([[0], np.cumsum(cns)]).astype(int)
                b = batches[d]
                m_pad = np.ones((b.n_node, 1), np.float32)
                pos_pad = np.zeros((b.n_node, 3), np.float32)
                vel_pad = np.zeros((b.n_node, 3), np.float32)
                for j, (o, n) in enumerate(zip(offs[:-1], cns)):
                    i = d * chunk + j
                    m_pad[o:o + n, 0] = masses[i]
                    pos_pad[o:o + n] = pos[i]
                    vel_pad[o:o + n] = vel[i]
                m_pads.append(m_pad)
                pos_pads.append(pos_pad)
                vel_pads.append(vel_pad)

            key = jax.random.fold_in(self._base_key, seg)
            if D == 1:
                p, v, ep, ek = self._runner(
                    self.variables, batch0, jnp.asarray(pos_pads[0]),
                    jnp.asarray(vel_pads[0]), jnp.asarray(m_pads[0]), key)
                p, v = np.asarray(p)[None], np.asarray(v)[None]
                ep, ek = np.asarray(ep)[None], np.asarray(ek)[None]
            else:
                if D not in self._sharded_runners:
                    self._sharded_runners[D] = self._make_sharded(D)
                stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *batches)
                keys = jax.random.split(key, D)
                p, v, ep, ek = self._sharded_runners[D](
                    self.variables, stacked,
                    jnp.asarray(np.stack(pos_pads)),
                    jnp.asarray(np.stack(vel_pads)),
                    jnp.asarray(np.stack(m_pads)), keys)
                p, v = np.asarray(p), np.asarray(v)
                ep, ek = np.asarray(ep), np.asarray(ek)

            pos, vel = [], []
            for d in range(D):
                cns = ns[d * chunk:(d + 1) * chunk]
                offs = np.concatenate([[0], np.cumsum(cns)]).astype(int)
                pos += [p[d, o:o + n] for o, n in zip(offs[:-1], cns)]
                vel += [v[d, o:o + n] for o, n in zip(offs[:-1], cns)]
            # (D, steps, G_pad) -> (steps, S) in original replica order
            e_pot.append(np.concatenate([ep[d][:, :chunk] for d in range(D)],
                                        axis=1))
            e_kin.append(np.concatenate([ek[d][:, :chunk] for d in range(D)],
                                        axis=1))

        return {"pos": pos, "vel": vel,
                "e_pot": np.concatenate(e_pot),
                "e_kin": np.concatenate(e_kin),
                "edge_counts": edge_counts,
                "n_shapes_compiled": len(self._shapes_seen)}
