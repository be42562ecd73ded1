"""A/B the dense-block SchNet execution mode vs the flat gather/scatter path
on the real chip, at bench.py shapes (512 molecules, reference defaults).

Times three things per mode:
- energy+force TRAIN step (the bench.py headline)
- energy+force MD inference step (the moldyn hot path)

Usage: timeout 550 python tools/bench_dense_schnet.py [--iters 50]
"""
import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--mols", type=int, default=512)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import optax

    from gcnn_keras_tpu.batch import batch_graphs
    from gcnn_keras_tpu.models.schnet import make_model
    from gcnn_keras_tpu.model.force import EnergyForceModel
    from gcnn_keras_tpu.training.losses import masked_graph_mae, masked_node_mae
    from bench import _mols, _timeit

    rs = np.random.RandomState(0)
    batch = batch_graphs(_mols(rs, args.mols), global_keys=("energy",))
    n_real_edges = int(np.asarray(batch.edge_mask).sum())
    print(f"batch: G={batch.n_graphs} N={batch.n_node} E={batch.n_edge} "
          f"M={batch.max_nodes} real_edges={n_real_edges}", flush=True)

    MODES = {
        "flat": {},
        "flat_remat": {"remat": True},
        "dense": {"dense_block": True},
        "dense_remat": {"dense_block": True, "remat": True},
        "dense_bf16": {"dense_block": True, "dtype": "bfloat16"},
        "dense_remat_bf16": {"dense_block": True, "remat": True,
                             "dtype": "bfloat16"},
    }
    results = {}
    params0 = None
    e_ref = f_ref = None
    for mode, kw in MODES.items():
        fmodel = EnergyForceModel(make_model(**kw))
        params = fmodel.init(jax.random.PRNGKey(0), batch, train=False)
        if params0 is None:
            params0 = params

        def loss_fn(params, b):
            out = fmodel.apply(params, b, train=False)
            e_loss = masked_graph_mae(out["energy"], b.globals["energy"],
                                      b.globals["graph_mask"])
            f_loss = masked_node_mae(out["force"], b.nodes["force"], b.node_mask)
            return e_loss + 100.0 * f_loss, {}

        optimizer = optax.adam(1e-3)
        opt_state = optimizer.init(params)

        @jax.jit
        def step(params, opt_state, b):
            (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, b)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        @jax.jit
        def infer(params, b):
            out = fmodel.apply(params, b, train=False)
            return out["energy"], out["force"]

        # parity vs flat on identical params
        e, f = infer(params0, batch)
        if e_ref is None:
            e_ref, f_ref = e, f
        else:
            de = float(jnp.abs(e - e_ref).max())
            df = float(jnp.abs(f - f_ref).max())
            print(f"{mode} parity vs flat: energy {de:.2e} force {df:.2e}",
                  flush=True)
            results[f"{mode}_parity_energy"] = de
            results[f"{mode}_parity_force"] = df

        dt, _ = _timeit(step, (params, opt_state, batch), iters=args.iters)
        dti, _ = _timeit(infer, (params, batch), iters=args.iters)
        print(f"{mode}: train {dt*1e3:.3f} ms ({n_real_edges/dt/1e6:.2f} M edges/s)"
              f"  infer {dti*1e3:.3f} ms", flush=True)
        results[f"{mode}_train_ms"] = dt * 1e3
        results[f"{mode}_infer_ms"] = dti * 1e3

    for mode in MODES:
        if mode != "flat":
            results[f"{mode}_speedup_train"] = (
                results["flat_train_ms"] / results[f"{mode}_train_ms"])
    print(json.dumps(results))


if __name__ == "__main__":
    main()
