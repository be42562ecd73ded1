"""NVE energy-drift on the real chip: unfused vs fused (gms) kernel paths.

Turns the r2 fused-kernel accuracy claim into the MD observable it matters
for: total-energy conservation of a velocity-Verlet trajectory driven by
the SchNet force path, comparing
  - unfused (default) sorted-segment-sum aggregation,
  - fused_aggregate=True (AD-closed gms Pallas kernel, the MD default),
each in the default bf16-split precision, against the CPU f64 integrator
floor recorded in tests/test_nve_conservation.py. Prints one JSON line;
results belong in PERF.md.
"""
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from gcnn_keras_tpu.batch import batch_graphs
    from gcnn_keras_tpu.graph.preprocess import set_range
    from gcnn_keras_tpu.models import schnet
    from gcnn_keras_tpu.moldyn.integrate import (
        make_energy_force_fn, nve_drift, velocity_verlet)

    steps = int(os.environ.get("NVE_STEPS", "5000"))
    n = 64  # bigger cluster than the CPU test: exercises real kernel blocks
    rs = np.random.RandomState(0)
    grid = np.stack(np.meshgrid(*[np.arange(4) * 1.6] * 3), -1).reshape(-1, 3)
    pos = (grid[:n] + rs.randn(n, 3) * 0.05).astype(np.float32)
    z = rs.choice([1, 6, 8], size=n)
    g = {"node_number": z, "node_coordinates": pos}
    g = set_range(g, max_distance=6.0, max_neighbours=25)
    g["edge_indices"] = g.pop("range_indices")
    batch = batch_graphs([g])
    mass_tab = np.array([0, 1.0, 0, 0, 0, 0, 12.0, 14.0, 16.0, 19.0])
    masses = jnp.asarray(np.where(
        np.asarray(batch.node_mask),
        mass_tab[np.clip(np.asarray(batch.nodes["node_number"]).astype(int),
                         0, 9)], 1.0).astype(np.float32))
    vel0 = jnp.asarray((rs.randn(batch.n_node, 3) * 0.02).astype(np.float32))
    pos0 = batch.nodes["node_coordinates"]

    results = {"steps": steps, "atoms": n,
               "edges": int(np.asarray(batch.edge_mask).sum())}
    # accurate = the fully fused f32-HIGHEST cfconv accuracy mode
    # (interaction_args={"accurate_cfconv": True}, VERDICT r4 item 6):
    # does its 38x micro-level force accuracy matter for NVE drift?
    for tag, args in (("unfused", {"fused_aggregate": False}),
                      ("fused_gms", {"fused_aggregate": True}),
                      ("accurate", {"accurate_cfconv": True})):
        model = schnet.make_model(
            depth=2, interaction_args={"units": 32, **args},
            gauss_args={"bins": 16, "distance_max": 6.0, "sigma": 0.4},
            last_mlp={"units": [32, 16],
                      "activation": ["shifted_softplus"] * 2},
            output_mlp={"units": [16, 1],
                        "activation": ["shifted_softplus", "linear"]})
        variables = model.init(jax.random.PRNGKey(0), batch)
        base = make_energy_force_fn(model, variables, batch)

        def ef(p, base=base):
            e, f = base(p)
            d = p - pos0
            return e + 0.25 * jnp.sum(d * d), f - 0.5 * d

        traj = velocity_verlet(ef, pos0, vel0, masses, 0.01, steps,
                               node_mask=batch.node_mask)
        m = nve_drift(traj)
        results[tag] = {k: float(f"{v:.4g}") for k, v in m.items()}
        print(f"{tag}: {results[tag]}", file=sys.stderr)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
