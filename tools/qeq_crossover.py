"""Place the dense-vs-iterative Qeq crossover and the fused-ACSF gate for
giant single molecules: scan-timed flagship train step at N atoms
(argv: atom counts; default 520 1040 2080), solver in (dense, cg), plus
fused-G4-only at the first size. One JSON line."""
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
    from gcnn_keras_tpu.batch import batch_graphs
    from gcnn_keras_tpu.graph.preprocess import set_range, set_angle
    from gcnn_keras_tpu.training.losses import (masked_graph_mae,
                                                masked_node_mae)
    from profile_large_mol import build

    sizes = [int(a) for a in sys.argv[1:]] or [520, 1040, 2080]
    record = {}

    def make_batch(n):
        rs = np.random.RandomState(3)
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
        return batch_graphs([g], global_keys=("energy", "total_charge"))

    def time_train(fmodel, batch, k=10):
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

        optimizer = optax.adam(1e-3)
        opt_state = optimizer.init(params)

        def step_fn(p, s, b):
            (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                p, b)
            upd, s = optimizer.update(grads, s, p)
            return optax.apply_updates(p, upd), s, loss

        @jax.jit
        def multi(p, s, b):
            def body(carry, _):
                p_, s_ = carry
                p_, s_, loss = step_fn(p_, s_, b)
                return (p_, s_), loss
            (p, s), losses = jax.lax.scan(body, (p, s), None, length=k)
            return p, s, losses[-1]

        out = multi(params, opt_state, batch)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(3):
            out = multi(params, opt_state, batch)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / 3 / k * 1e3, float(out[2])

    for n in sizes:
        batch = make_batch(n)
        record[f"n{n}_angles"] = int(np.asarray(batch.angle_mask).sum())
        for solver in ("dense", "iterative"):
            ms, loss = time_train(build(solver), batch)
            record[f"n{n}_{solver}_ms"] = round(ms, 3)
            record[f"n{n}_{solver}_loss"] = round(loss, 5)
            print(json.dumps({f"n{n}_{solver}_ms": record[f"n{n}_{solver}_ms"]}),
                  flush=True)

    # fused G4 only (G2 stays auto-unfused at 2k edges) at the first size
    from gcnn_keras_tpu.models.hdnnp4th import make_model_behler
    from gcnn_keras_tpu.model.force import EnergyForceModel
    elements = [1, 6, 7, 8, 9]
    model = make_model_behler(
        g2_kwargs={"eta": [0.0, 0.3], "rs": [0.0, 3.0], "rc": 3.5,
                   "elements": elements},
        g4_kwargs={"eta": [0.0, 0.3], "lamda": [-1.0, 1.0], "rc": 3.5,
                   "zeta": [1.0, 8.0], "elements": elements,
                   "multiplicity": 2.0, "fused": True},
        mlp_charge_kwargs={"units": [64, 64, 1], "num_relations": 10,
                           "activation": ["swish", "swish", "linear"]},
        mlp_local_kwargs={"units": [64, 64, 1], "num_relations": 10,
                          "activation": ["swish", "swish", "linear"]},
        electrostatic_kwargs={"param_trainable": False, "solver": "dense"})
    ms, loss = time_train(EnergyForceModel(model, use_esp_coupling=True),
                          make_batch(sizes[0]))
    record[f"n{sizes[0]}_dense_fusedg4only_ms"] = round(ms, 3)
    record[f"n{sizes[0]}_dense_fusedg4only_loss"] = round(loss, 5)
    print(json.dumps(record))


if __name__ == "__main__":
    main()
