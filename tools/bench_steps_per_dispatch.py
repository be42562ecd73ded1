"""A/B the --steps-per-dispatch trainer knob on the real chip: one epoch of
K same-shape SchNet E+F batches, sequential dispatch vs fused lax.scan
dispatch, through the REAL Trainer.fit_epoch path.

Usage: timeout 590 python tools/bench_steps_per_dispatch.py
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import optax

    from bench import _mols
    from gcnn_keras_tpu.batch import batch_graphs
    from gcnn_keras_tpu.models.schnet import make_model
    from gcnn_keras_tpu.model.force import EnergyForceModel
    from gcnn_keras_tpu.training.losses import masked_graph_mae, masked_node_mae
    from gcnn_keras_tpu.training.trainer import Trainer

    rs = np.random.RandomState(0)
    # 16 batches of 128 molecules each, identical padded shapes
    batches = [batch_graphs(_mols(rs, 128), n_node_pad=2560, n_edge_pad=16384,
                            max_nodes=20, global_keys=("energy",))
               for _ in range(16)]
    fmodel = EnergyForceModel(make_model())
    params = fmodel.init(jax.random.PRNGKey(0), batches[0], train=False)

    def loss_fn(p, b):
        out = fmodel.apply(p, b, train=False)
        e = masked_graph_mae(out["energy"], b.globals["energy"],
                             b.globals["graph_mask"])
        f = masked_node_mae(out["force"], b.nodes["force"], b.node_mask)
        return e + 100.0 * f, {}

    results = {}
    for spd in [1, 8]:
        tr = Trainer(loss_fn, optax.adam(1e-3))
        state = tr.init_state(jax.tree.map(jnp.array, params))
        # warm (compiles)
        state, _ = tr.fit_epoch(state, batches, steps_per_dispatch=spd)
        t0 = time.perf_counter()
        reps = 5
        for _ in range(reps):
            state, em = tr.fit_epoch(state, batches, steps_per_dispatch=spd)
        dt = (time.perf_counter() - t0) / (reps * len(batches))
        results[f"spd{spd}_ms_per_step"] = round(dt * 1e3, 3)
        print(f"steps_per_dispatch={spd}: {dt*1e3:.3f} ms/step "
              f"(epoch of {len(batches)} x 128-mol batches)", flush=True)
    results["speedup"] = round(results["spd1_ms_per_step"]
                               / results["spd8_ms_per_step"], 3)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
