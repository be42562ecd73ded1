"""Scan ground truth for the flagship HDNNP4th train step (the bench.py
hdnnp4th record): K real optimizer steps inside ONE jitted lax.scan vs the
20-iter dispatch loop. The per-op profile (tools/profile_hdnnp_step.py)
shows step markers at ~1.2 ms device time against a ~13 ms dispatch-loop
reading — this tool decides which is real."""
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

    from bench import _mols, _timeit
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
    model = make_model_behler(
        g2_kwargs={"eta": [0.0, 0.3], "rs": [0.0, 3.0], "rc": 4.0,
                   "elements": elements},
        g4_kwargs={"eta": [0.0, 0.3], "lamda": [-1.0, 1.0], "rc": 4.0,
                   "zeta": [1.0, 8.0], "elements": elements,
                   "multiplicity": 2.0},
        mlp_charge_kwargs={"units": [64, 64, 1], "num_relations": 10,
                           "activation": ["swish", "swish", "linear"]},
        mlp_local_kwargs={"units": [64, 64, 1], "num_relations": 10,
                          "activation": ["swish", "swish", "linear"]})
    fmodel = EnergyForceModel(model, use_esp_coupling=True)
    params = fmodel.init(jax.random.PRNGKey(0), batch, train=False)

    def loss_fn(p, b):
        out = fmodel.apply(p, b, train=False)
        e = masked_graph_mae(out["energy"], b.globals["energy"],
                             b.globals["graph_mask"])
        f = masked_node_mae(out["force"], b.nodes["force"], b.node_mask)
        q = masked_node_mae(out["charge"], b.nodes["charge"], b.node_mask)
        return 50.0 * q + e + 200.0 * f, {}

    opt = optax.adam(1e-3)
    ostate = opt.init(params)

    def step_fn(p, o, b):
        (l, _), g = jax.value_and_grad(loss_fn, has_aux=True)(p, b)
        u, o = opt.update(g, o, p)
        return optax.apply_updates(p, u), o, l

    step = jax.jit(step_fn)
    dt_loop, _ = _timeit(step, (params, ostate, batch), iters=20)

    k = 20

    @jax.jit
    def multi(p, o, b):
        def body(carry, _):
            p, o = carry
            p, o, l = step_fn(p, o, b)
            return (p, o), l

        (p, o), ls = jax.lax.scan(body, (p, o), None, length=k)
        return p, o, ls[-1]

    r = multi(params, ostate, batch)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(3):
        r = multi(params, ostate, batch)
    jax.block_until_ready(r)
    dt_scan = (time.perf_counter() - t0) / (3 * k)

    print(json.dumps({
        "step_loop_ms": round(dt_loop * 1e3, 3),
        "step_scan_ms": round(dt_scan * 1e3, 3),
        "edges_per_sec_scan": round(n_edges / dt_scan, 1),
        "angles_per_sec_scan": round(n_angles / dt_scan, 1),
    }))


if __name__ == "__main__":
    main()
