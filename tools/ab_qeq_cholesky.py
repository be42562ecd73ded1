"""A/B the dense-Qeq implementations on the chip: bordered-LU
(reference-equivalent) vs SPD Cholesky + Schur-eliminated constraint
(qeq_solver.solve_qeq_dense_cholesky).

Three workloads, scan ground truth + loss parity:
  1. flagship 128-mol E+F+q train step (bench hdnnp_step shapes; the Qeq
     solve is ~2.1-2.7 ms of the ~7 ms step there)
  2. 520-atom single-molecule flagship step (bench hdnnp_large_mol)
  3. 2080-atom single-molecule flagship step (bench hdnnp_giant_mol)

Usage: python tools/ab_qeq_cholesky.py [flagship|large|giant|all]
"""
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _flagship_step(jax, optax, dense_impl):
    from bench import _mols, _family_record, bench_hdnnp4th_model
    from gcnn_keras_tpu.batch import batch_graphs
    from gcnn_keras_tpu.model.force import EnergyForceModel
    from gcnn_keras_tpu.training.losses import (masked_graph_mae,
                                                masked_node_mae)
    import jax.numpy as jnp  # noqa: F401

    rs = np.random.RandomState(1)
    batch = batch_graphs(_mols(rs, 128, with_esp=True),
                         global_keys=("energy", "total_charge"))
    n_edges = int(np.asarray(batch.edge_mask).sum())
    fmodel = EnergyForceModel(
        bench_hdnnp4th_model(solver="dense", dense_impl=dense_impl),
        use_esp_coupling=True)
    params = jax.jit(lambda k, b: fmodel.init(k, b, train=False))(
        jax.random.PRNGKey(0), batch)

    def loss_fn(params, b):
        out = fmodel.apply(params, b, train=False)
        e = masked_graph_mae(out["energy"], b.globals["energy"],
                             b.globals["graph_mask"])
        f = masked_node_mae(out["force"], b.nodes["force"], b.node_mask)
        q = masked_node_mae(out["charge"], b.nodes["charge"], b.node_mask)
        return 50.0 * q + e + 200.0 * f, {}

    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)

    def step_fn(params, opt_state, b):
        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, b)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step_fn, (params, opt_state, batch), n_edges


def run(jax, optax, name, make):
    from bench import _family_record
    out = {}
    for impl in ("lu", "cholesky"):
        step_fn, args, n_edges = make(impl)
        rec = _family_record(jax, step_fn, args, n_edges)
        # one step's loss for parity
        loss = float(np.asarray(jax.jit(step_fn)(*args)[2]))
        rec["loss_step0"] = loss
        out[impl] = rec
        print(json.dumps({"workload": name, "impl": impl, **rec}),
              flush=True)
    sp = out["lu"]["ms_per_step_scan"] / out["cholesky"]["ms_per_step_scan"]
    dl = abs(out["lu"]["loss_step0"] - out["cholesky"]["loss_step0"])
    print(json.dumps({"workload": name, "speedup_scan": round(sp, 3),
                      "loss_abs_diff": dl}), flush=True)


def _large_step_factory(jax, optax, n):
    def make(impl):
        import bench
        # reuse the bench large-mol builder but override the solver impl
        orig = bench.bench_hdnnp4th_model
        from gcnn_keras_tpu.models.hdnnp4th import make_model_behler
        from gcnn_keras_tpu.model.force import EnergyForceModel
        from gcnn_keras_tpu.training.losses import (masked_graph_mae,
                                                    masked_node_mae)
        from gcnn_keras_tpu.batch import batch_graphs
        from gcnn_keras_tpu.graph.preprocess import set_range, set_angle

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
        batch = batch_graphs([g], global_keys=("energy", "total_charge"))
        n_edges = int(np.asarray(batch.edge_mask).sum())

        elements = [1, 6, 7, 8, 9]
        model = make_model_behler(
            g2_kwargs={"eta": [0.0, 0.3], "rs": [0.0, 3.0], "rc": 3.5,
                       "elements": elements},
            g4_kwargs={"eta": [0.0, 0.3], "lamda": [-1.0, 1.0], "rc": 3.5,
                       "zeta": [1.0, 8.0], "elements": elements,
                       "multiplicity": 2.0},
            mlp_charge_kwargs={"units": [64, 64, 1], "num_relations": 10,
                               "activation": ["swish", "swish", "linear"]},
            mlp_local_kwargs={"units": [64, 64, 1], "num_relations": 10,
                              "activation": ["swish", "swish", "linear"]},
            electrostatic_kwargs={"param_trainable": False,
                                  "solver": "dense", "dense_impl": impl})
        fmodel = EnergyForceModel(model, use_esp_coupling=True)
        params = jax.jit(lambda k, b: fmodel.init(k, b, train=False))(
            jax.random.PRNGKey(0), batch)

        def loss_fn(params, b):
            out = fmodel.apply(params, b, train=False)
            e = masked_graph_mae(out["energy"], b.globals["energy"],
                                 b.globals["graph_mask"])
            f = masked_node_mae(out["force"], b.nodes["force"], b.node_mask)
            q = masked_node_mae(out["charge"], b.nodes["charge"],
                                b.node_mask)
            return 50.0 * q + e + 200.0 * f, {}

        import optax as _optax
        optimizer = _optax.adam(1e-3)
        opt_state = optimizer.init(params)

        def step_fn(params, opt_state, b):
            (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, b)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = _optax.apply_updates(params, updates)
            return params, opt_state, loss

        return step_fn, (params, opt_state, batch), n_edges
    return make


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import optax

    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("flagship", "all"):
        run(jax, optax, "flagship_128mol",
            lambda impl: _flagship_step(jax, optax, impl))
    if which in ("large", "all"):
        run(jax, optax, "large_520", _large_step_factory(jax, optax, 520))
    if which in ("giant", "all"):
        run(jax, optax, "giant_2080", _large_step_factory(jax, optax, 2080))


if __name__ == "__main__":
    main()
