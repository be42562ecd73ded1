"""Census of the compiled SchNet train step on TPU: counts Pallas
custom-call instances, gathers/scatters, and times forward / forward+force
/ full step to locate the remaining milliseconds."""
import collections
import json
import os
import re
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timeit(fn, args, iters=50):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


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

    rs = np.random.RandomState(0)
    batch = batch_graphs(_mols(rs, 512), global_keys=("energy",))

    fmodel = EnergyForceModel(make_model())
    params = fmodel.init(jax.random.PRNGKey(0), batch, train=False)

    emodel = make_model()
    eparams = params  # EnergyForceModel shares the inner model's param tree

    @jax.jit
    def fwd(p, b):
        return emodel.apply(p, b)["output"]

    @jax.jit
    def ef(p, b):
        return fmodel.apply(p, b, train=False)

    def loss_fn(p, b):
        out = fmodel.apply(p, b, train=False)
        e = masked_graph_mae(out["energy"], b.globals["energy"],
                             b.globals["graph_mask"])
        f = masked_node_mae(out["force"], b.nodes["force"], b.node_mask)
        return e + 100.0 * f, {}

    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)

    @jax.jit
    def step(p, o, b):
        (l, _), g = jax.value_and_grad(loss_fn, has_aux=True)(p, b)
        u, o = optimizer.update(g, o, p)
        return optax.apply_updates(p, u), o, l

    res = {}
    res["fwd_ms"] = round(timeit(fwd, (eparams, batch)) * 1e3, 3)
    res["energy_force_ms"] = round(timeit(ef, (params, batch)) * 1e3, 3)
    res["train_step_ms"] = round(timeit(step, (params, opt_state, batch))
                                 * 1e3, 3)

    txt = step.lower(params, opt_state, batch).compile().as_text()
    ops = collections.Counter()
    for line in txt.splitlines():
        if "custom-call" in line and "tpu_custom_call" in line:
            ops["pallas_custom_call"] += 1
        m = re.search(r"= \S+ (gather|scatter|dot|dynamic-slice)\(", line)
        if m:
            ops[m.group(1)] += 1
        if line.strip().startswith("fusion"):
            ops["fusion"] += 1
    res["hlo_counts"] = dict(ops)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
