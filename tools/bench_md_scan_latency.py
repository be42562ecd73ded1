"""Ground-truth MD step latency via a scanned velocity-Verlet trajectory.

Dispatch-loop timings of sub-ms single-molecule MD steps through the
tunneled chip are unreliable in BOTH directions (repeat-call caching can
deflate, per-dispatch latency can inflate). This tool times K integrator
steps inside ONE jitted lax.scan and reports the SLOPE between two scan
lengths — per_step = (T(K2) - T(K1)) / (K2 - K1) — which cancels dispatch,
transfer and any fixed per-execution cost. One jitted runner per mode
(jit once, execute many; a fresh jit per call would measure retracing).

Compares execution modes of the same SchNet potential (identical params):
flat gather/scatter, fused-pallas (gms), dense-block f32, dense-block bf16.

Usage: timeout 590 python tools/bench_md_scan_latency.py
"""
import json
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, ".")


def _chain_mol(n, seed=0):
    from gcnn_keras_tpu.graph.preprocess import set_range
    rs = np.random.RandomState(seed)
    t = np.arange(n) * 1.2
    pos = np.stack([t, 1.5 * np.sin(t * 0.9), 1.5 * np.cos(t * 0.7)], axis=1)
    pos = (pos + rs.randn(n, 3) * 0.1).astype(np.float32)
    g = {"node_number": rs.choice([1, 6, 7, 8], size=n),
         "node_coordinates": pos,
         "energy": np.array([0.0], dtype=np.float32)}
    g = set_range(g, max_distance=4.0, max_neighbours=25)
    g["edge_indices"] = g.pop("range_indices")
    return g


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from gcnn_keras_tpu.batch import batch_graphs
    from gcnn_keras_tpu.models.schnet import make_model
    from gcnn_keras_tpu.moldyn.integrate import make_energy_force_fn

    K1, K2, REPS = 50, 400, 3
    DT = 5e-4
    results = {}
    for n_atoms in [21, 60, 180]:
        batch = batch_graphs([_chain_mol(n_atoms)], global_keys=("energy",))
        pos0 = batch.nodes["node_coordinates"]
        vel0 = jnp.zeros_like(pos0)
        mask = batch.node_mask[:, None].astype(jnp.float32)
        m = jnp.full((batch.n_node, 1), 12.0, jnp.float32)
        modes = {
            "flat": {},
            "fused": {"interaction_args": {"fused_aggregate": True}},
            "dense": {"dense_block": True},
            "dense_bf16": {"dense_block": True, "dtype": "bfloat16"},
        }
        params = None
        for mode, kw in modes.items():
            model = make_model(**kw)
            if params is None:
                params = model.init(jax.random.PRNGKey(0), batch)
            fn = make_energy_force_fn(model, params, batch)

            def body(carry, _):
                pos, vel, force = carry
                vel_h = vel + 0.5 * DT * force / m
                pos_n = pos + DT * vel_h * mask
                e, f_n = fn(pos_n)
                f_n = f_n * mask
                vel_n = vel_h + 0.5 * DT * f_n / m
                return (pos_n, vel_n, f_n), e

            @partial(jax.jit, static_argnums=2)
            def run(pos, vel, k):
                _, f0 = fn(pos)
                (p, v, _), es = jax.lax.scan(body, (pos, vel, f0 * mask),
                                             None, length=k)
                return p, v, es[-1]

            def wall(k):
                out = run(pos0, vel0, k)  # compile + warm
                jax.block_until_ready(out)
                t0 = time.perf_counter()
                for _ in range(REPS):
                    out = run(pos0, vel0, k)
                jax.block_until_ready(out)
                return (time.perf_counter() - t0) / REPS

            t1, t2 = wall(K1), wall(K2)
            per_step = (t2 - t1) / (K2 - K1)
            results[f"n{n_atoms}_{mode}_us"] = round(per_step * 1e6, 1)
            print(f"N={n_atoms} {mode}: {per_step*1e6:.1f} us/MD-step "
                  f"(T{K1}={t1*1e3:.1f} ms, T{K2}={t2*1e3:.1f} ms)",
                  flush=True)
        params = None
    print(json.dumps(results))


if __name__ == "__main__":
    main()
