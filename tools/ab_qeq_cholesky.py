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
    from bench import _mols, bench_hdnnp4th_model
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
        from bench import bench_large_mol_step
        step_fn, args, n_edges, _ = bench_large_mol_step(
            jax, optax, n, solver="dense", dense_impl=impl)
        return step_fn, args, n_edges
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
