"""Decompose the 520-atom giant-molecule flagship step (VERDICT r4 item 4:
the `hdnnp4th_large_mol` bench record runs ~9x below the flagship per-edge
rate with no evidence of where the 9.4 ms goes).

Scan-timed components at the exact bench configuration:
- full charge+energy+force train step, for each Qeq solver
  (auto->iterative CG at M=520, dense, and CG at looser tolerances);
- energy forward only / energy+force (how much is the Qeq AD recursion);
- forced-fused ACSF variant (6.2k angles sit under the 8192 auto gate).

One JSON line.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def build(solver, cg_tol=1e-6, fused=None):
    from gcnn_keras_tpu.models.hdnnp4th import make_model_behler
    from gcnn_keras_tpu.model.force import EnergyForceModel
    elements = [1, 6, 7, 8, 9]
    g4 = {"eta": [0.0, 0.3], "lamda": [-1.0, 1.0], "rc": 3.5,
          "zeta": [1.0, 8.0], "elements": elements, "multiplicity": 2.0}
    g2 = {"eta": [0.0, 0.3], "rs": [0.0, 3.0], "rc": 3.5,
          "elements": elements}
    if fused is not None:
        g4["fused"] = fused
        g2["fused"] = fused
    model = make_model_behler(
        g2_kwargs=g2, g4_kwargs=g4,
        mlp_charge_kwargs={"units": [64, 64, 1], "num_relations": 10,
                           "activation": ["swish", "swish", "linear"]},
        mlp_local_kwargs={"units": [64, 64, 1], "num_relations": 10,
                          "activation": ["swish", "swish", "linear"]},
        electrostatic_kwargs={"param_trainable": False, "solver": solver,
                              "cg_tol": cg_tol})
    return EnergyForceModel(model, use_esp_coupling=True)


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import optax
    from gcnn_keras_tpu.batch import batch_graphs
    from gcnn_keras_tpu.graph.preprocess import set_range, set_angle
    from gcnn_keras_tpu.training.losses import (masked_graph_mae,
                                                masked_node_mae)

    rs = np.random.RandomState(3)
    n = 520
    t = np.arange(n) * 1.3
    pos = np.stack([t, 2.0 * np.sin(t * 0.05), 2.0 * np.cos(t * 0.03)],
                   axis=1).astype(np.float32)
    pos += rs.randn(n, 3).astype(np.float32) * 0.05
    g = {"node_number": rs.choice([1, 6, 7, 8, 9], size=n),
         "node_coordinates": pos,
         "energy": np.array([rs.randn()], dtype=np.float32)}
    g = set_range(g, max_distance=3.5, max_neighbours=12)
    g["edge_indices"] = g.pop("range_indices")
    g = set_angle(g, range_indices="edge_indices")
    g["force"] = (rs.randn(n, 3) * 0.1).astype(np.float32)
    g["esp"] = (rs.randn(n) * 0.02).astype(np.float32)
    g["esp_grad"] = (rs.randn(n, 3) * 0.02).astype(np.float32)
    g["total_charge"] = np.zeros((1,), dtype=np.float32)
    g["charge"] = (rs.randn(n) * 0.1).astype(np.float32)
    batch = batch_graphs([g], global_keys=("energy", "total_charge"))
    record = {"atoms": n,
              "n_edges": int(np.asarray(batch.edge_mask).sum()),
              "n_angles": int(np.asarray(batch.angle_mask).sum()),
              "edge_locality": bool(batch.edge_window_local),
              "angle_locality": bool(batch.angle_window_local)}

    def time_step(fmodel, label, train=True, k=10):
        params = jax.jit(lambda key, b: fmodel.init(key, b, train=False))(
            jax.random.PRNGKey(0), batch)

        def loss_fn(p, b):
            out = fmodel.apply(p, b, train=False)
            e = masked_graph_mae(out["energy"], b.globals["energy"],
                                 b.globals["graph_mask"])
            f = masked_node_mae(out["force"], b.nodes["force"], b.node_mask)
            q = masked_node_mae(out["charge"], b.nodes["charge"],
                                b.node_mask)
            return 50.0 * q + e + 200.0 * f, {}

        if train:
            optimizer = optax.adam(1e-3)
            opt_state = optimizer.init(params)

            def step_fn(p, s, b):
                (loss, _), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(p, b)
                upd, s = optimizer.update(grads, s, p)
                return optax.apply_updates(p, upd), s, loss

            @jax.jit
            def multi(p, s, b):
                def body(carry, _):
                    p_, s_, = carry
                    p_, s_, loss = step_fn(p_, s_, b)
                    return (p_, s_), loss
                (p, s), losses = jax.lax.scan(body, (p, s), None, length=k)
                return p, s, losses[-1]

            args = (params, opt_state, batch)
        else:
            @jax.jit
            def multi(p, _unused, b):
                # carry feeds the coordinates at 1e-30 scale so XLA cannot
                # hoist the loop body as invariant
                def body(carry, _):
                    loss, _aux = loss_fn(p, b.replace_nodes(
                        node_coordinates=b.nodes["node_coordinates"]
                        + carry * 1e-30))
                    return carry + loss, loss
                c, losses = jax.lax.scan(body, jnp.float32(0.0), None,
                                         length=k)
                return c, losses[-1]

            args = (params, None, batch)

        out = multi(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(3):
            out = multi(*args)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / 3 / k
        record[label] = round(dt * 1e3, 3)
        record[label + "_loss"] = float(np.asarray(out[-1]))
        print(json.dumps({label: record[label]}), flush=True)

    # full train step per solver configuration
    time_step(build("auto"), "train_cg_tol1e6")
    time_step(build("dense"), "train_dense")
    time_step(build("auto", cg_tol=1e-4), "train_cg_tol1e4")
    # fused-ACSF forced on (angles below the auto gate)
    time_step(build("dense", fused=True), "train_dense_forcedfused")
    # energy+force evaluation only (no optimizer, no loss second reverse)
    time_step(build("auto"), "ef_eval_cg", train=False)
    time_step(build("dense"), "ef_eval_dense", train=False)

    print(json.dumps(record))


if __name__ == "__main__":
    main()
