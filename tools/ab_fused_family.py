"""A/B the cfconv aggregation paths on the real TPU chip.

Variants (--variant):
  train_unfused / train_family / train_vjp : SchNet energy+force train step
  md_unfused / md_family / md_vjp          : energy+force inference step

Prints one JSON line: {"variant", "ms", "edges_per_sec"}.
"""
import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", required=True)
    ap.add_argument("--mols", type=int, default=512)
    ap.add_argument("--iters", type=int, default=50)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import optax

    from bench import _mols, _timeit
    from gcnn_keras_tpu.batch import batch_graphs
    from gcnn_keras_tpu.models.schnet import make_model
    from gcnn_keras_tpu.model.force import EnergyForceModel
    from gcnn_keras_tpu.training.losses import masked_graph_mae, masked_node_mae

    mode, path = args.variant.split("_")
    fused = {"unfused": False, "family": True, "vjp": "vjp"}[path]

    rs = np.random.RandomState(0)
    batch = batch_graphs(_mols(rs, args.mols), global_keys=("energy",))
    n_real_edges = int(np.asarray(batch.edge_mask).sum())

    fmodel = EnergyForceModel(make_model(
        interaction_args={"units": 128, "use_bias": True,
                          "fused_aggregate": fused}))
    params = fmodel.init(jax.random.PRNGKey(0), batch, train=False)

    if mode == "train":
        def loss_fn(params, b):
            out = fmodel.apply(params, b, train=False)
            e = masked_graph_mae(out["energy"], b.globals["energy"],
                                 b.globals["graph_mask"])
            f = masked_node_mae(out["force"], b.nodes["force"], b.node_mask)
            return e + 100.0 * f, {}

        optimizer = optax.adam(1e-3)
        opt_state = optimizer.init(params)

        @jax.jit
        def step(params, opt_state, b):
            (loss, _), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params, b)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        dt, _ = _timeit(step, (params, opt_state, batch), iters=args.iters)
    else:
        @jax.jit
        def infer(params, b):
            return fmodel.apply(params, b, train=False)

        dt, _ = _timeit(infer, (params, batch), iters=args.iters)

    print(json.dumps({"variant": args.variant, "ms": round(dt * 1e3, 3),
                      "edges_per_sec": round(n_real_edges / dt, 1)}))


if __name__ == "__main__":
    main()
