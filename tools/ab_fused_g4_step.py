"""Full flagship HDNNP4th train-step A/B: fused G4 kernels vs unfused
(bench config, scan-timed ground truth). One JSON line."""
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
    import jax.numpy as jnp
    import optax

    from bench import _mols
    from gcnn_keras_tpu.batch import batch_graphs
    from gcnn_keras_tpu.models.hdnnp4th import make_model_behler
    from gcnn_keras_tpu.model.force import EnergyForceModel
    from gcnn_keras_tpu.training.losses import masked_graph_mae, masked_node_mae

    rs = np.random.RandomState(1)
    batch = batch_graphs(_mols(rs, 128, with_esp=True),
                         global_keys=("energy", "total_charge"))
    n_edges = int(np.asarray(batch.edge_mask).sum())
    n_angles = int(np.asarray(batch.angle_mask).sum())
    elements = [1, 6, 7, 8, 9]
    record = {"n_edges": n_edges, "n_angles": n_angles}

    for name, fused in (("unfused", False), ("fused", True)):
        model = make_model_behler(
            g2_kwargs={"eta": [0.0, 0.3], "rs": [0.0, 3.0], "rc": 4.0,
                       "elements": elements},
            g4_kwargs={"eta": [0.0, 0.3], "lamda": [-1.0, 1.0], "rc": 4.0,
                       "zeta": [1.0, 8.0], "elements": elements,
                       "multiplicity": 2.0, "fused": fused},
            mlp_charge_kwargs={"units": [64, 64, 1], "num_relations": 10,
                               "activation": ["swish", "swish", "linear"]},
            mlp_local_kwargs={"units": [64, 64, 1], "num_relations": 10,
                              "activation": ["swish", "swish", "linear"]})
        fmodel = EnergyForceModel(model, use_esp_coupling=True)
        params = jax.jit(lambda k, b: fmodel.init(k, b, train=False))(
            jax.random.PRNGKey(0), batch)

        def loss_fn(params, b):
            out = fmodel.apply(params, b, train=False)
            e_loss = masked_graph_mae(out["energy"], b.globals["energy"],
                                      b.globals["graph_mask"])
            f_loss = masked_node_mae(out["force"], b.nodes["force"],
                                     b.node_mask)
            q_loss = masked_node_mae(out["charge"], b.nodes["charge"],
                                     b.node_mask)
            return 50.0 * q_loss + e_loss + 200.0 * f_loss, {}

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

        out = multi(params, opt_state, batch)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(3):
            out = multi(params, opt_state, batch)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / 3 / k
        record[f"{name}_ms_per_step_scan"] = round(dt * 1e3, 3)
        record[f"{name}_loss"] = float(out[2])
    record["speedup"] = round(record["unfused_ms_per_step_scan"]
                              / record["fused_ms_per_step_scan"], 3)
    print(json.dumps(record))


if __name__ == "__main__":
    main()
