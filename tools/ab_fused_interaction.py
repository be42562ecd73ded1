"""Full SchNet energy+force train-step A/B: fused-chain interaction
kernels (ops/pallas/fused_interaction.py) vs the unfused default, at the
bench's 512-molecule configuration, scan-timed ground truth. One JSON
line. Optional argv[1] = number of molecules (default 512)."""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import optax

    from bench import _mols
    from gcnn_keras_tpu.batch import batch_graphs
    from gcnn_keras_tpu.models.schnet import make_model
    from gcnn_keras_tpu.model.force import EnergyForceModel
    from gcnn_keras_tpu.training.losses import (masked_graph_mae,
                                                masked_node_mae)

    n_mols = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    rs = np.random.RandomState(0)
    batch = batch_graphs(_mols(rs, n_mols), global_keys=("energy",))
    n_edges = int(np.asarray(batch.edge_mask).sum())
    record = {"n_mols": n_mols, "n_edges": n_edges,
              "edge_window_local": bool(batch.edge_window_local)}

    for name, fused in (("unfused", False), ("fused", True)):
        fmodel = EnergyForceModel(make_model(
            interaction_args={"units": 128, "fused_chain": fused}))
        params = jax.jit(lambda k, b: fmodel.init(k, b, train=False))(
            jax.random.PRNGKey(0), batch)

        def loss_fn(params, b):
            out = fmodel.apply(params, b, train=False)
            e_loss = masked_graph_mae(out["energy"], b.globals["energy"],
                                      b.globals["graph_mask"])
            f_loss = masked_node_mae(out["force"], b.nodes["force"],
                                     b.node_mask)
            return e_loss + 100.0 * f_loss, {}

        optimizer = optax.adam(1e-3)
        opt_state = optimizer.init(params)

        def step_fn(params, opt_state, b):
            (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, b)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        k = 10

        @jax.jit
        def multi(params, opt_state, b):
            def body(carry, _):
                p, s = carry
                p, s, loss = step_fn(p, s, b)
                return (p, s), loss

            (p, s), losses = jax.lax.scan(body, (params, opt_state), None,
                                          length=k)
            return p, s, losses[-1]

        t_c0 = time.perf_counter()
        out = multi(params, opt_state, batch)
        jax.block_until_ready(out)
        record[f"{name}_compile_s"] = round(time.perf_counter() - t_c0, 1)
        t0 = time.perf_counter()
        for _ in range(3):
            out = multi(params, opt_state, batch)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / 3 / k
        record[f"{name}_ms_per_step_scan"] = round(dt * 1e3, 3)
        record[f"{name}_loss"] = float(out[2])
        print(json.dumps(record), flush=True)
    record["speedup"] = round(record["unfused_ms_per_step_scan"]
                              / record["fused_ms_per_step_scan"], 3)
    print(json.dumps(record))


if __name__ == "__main__":
    main()
