"""Single-molecule MD step latency: flat vs fused-pallas vs dense-block.

Real MD drives ONE molecule per step (moldyn/ase_calc.py) — the regime is
latency/dispatch-bound, not throughput-bound, which is where the dense-block
mode (zero gathers, one fused elementwise pipeline) should shine. Sweeps
molecule sizes to find the flat/dense crossover.

Also measures donate_argnums on the 512-mol train step (cheap HBM win?).

Usage: timeout 590 python tools/bench_md_latency.py
"""
import json
import sys

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
    import optax

    from gcnn_keras_tpu.batch import batch_graphs
    from gcnn_keras_tpu.models.schnet import make_model
    from gcnn_keras_tpu.model.force import EnergyForceModel
    from bench import _timeit

    results = {}
    for n_atoms in [21, 60, 180]:
        batch = batch_graphs([_chain_mol(n_atoms)], global_keys=("energy",))
        n_edges = int(np.asarray(batch.edge_mask).sum())
        modes = {
            "flat": {},
            "fused": {"interaction_args": {"fused_aggregate": True}},
            "dense": {"dense_block": True},
            "dense_bf16": {"dense_block": True, "dtype": "bfloat16"},
        }
        params0 = None
        f_ref = None
        for mode, kw in modes.items():
            fmodel = EnergyForceModel(make_model(**kw))
            if params0 is None:
                params0 = fmodel.init(jax.random.PRNGKey(0), batch, train=False)

            @jax.jit
            def infer(params, b):
                out = fmodel.apply(params, b, train=False)
                return out["energy"], out["force"]

            e, f = infer(params0, batch)
            if f_ref is None:
                f_ref = f
            df = float(jnp.abs(f - f_ref).max())
            dt, _ = _timeit(infer, (params0, batch), iters=300)
            key = f"n{n_atoms}_{mode}"
            results[key + "_ms"] = round(dt * 1e3, 4)
            print(f"N={n_atoms} E={n_edges} {mode}: {dt*1e3:.3f} ms "
                  f"(force dev {df:.1e})", flush=True)
        f_ref = None

    # donate_argnums on the 512-mol train step
    from bench import bench_schnet_setup
    step, (params, opt_state, batch), n_real = bench_schnet_setup(
        jax, jnp, optax)
    dt, _ = _timeit(step, (params, opt_state, batch), iters=50)
    results["train_512_ms"] = round(dt * 1e3, 3)
    print(f"train 512 (no donate): {dt*1e3:.3f} ms", flush=True)

    # rebuild with donation: reuse the same underlying python fn
    try:
        fun = step.__wrapped__
    except AttributeError:
        print(json.dumps(results))
        return
    step2 = jax.jit(fun, donate_argnums=(0, 1))
    out = step2(params, opt_state, batch)
    jax.block_until_ready(out)
    params2, opt2, _ = out
    import time
    t0 = time.perf_counter()
    iters = 50
    for _ in range(iters):
        params2, opt2, loss = step2(params2, opt2, batch)
    jax.block_until_ready(loss)
    dt2 = (time.perf_counter() - t0) / iters
    results["train_512_donate_ms"] = round(dt2 * 1e3, 3)
    print(f"train 512 (donated): {dt2*1e3:.3f} ms", flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
