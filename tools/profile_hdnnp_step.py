"""Per-op profile of the flagship HDNNP4th charge+energy+force train step
(same configuration as bench.bench_hdnnp4th) on the real chip — where does
the 13-16 ms go now that the r2 ACSF optimizations landed?"""
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import optax
    import glob
    import tempfile

    from bench import _mols
    from profile_step import aggregate_xplane
    from gcnn_keras_tpu.batch import batch_graphs
    from gcnn_keras_tpu.models.hdnnp4th import make_model_behler
    from gcnn_keras_tpu.model.force import EnergyForceModel
    from gcnn_keras_tpu.training.losses import masked_graph_mae, masked_node_mae

    rs = np.random.RandomState(1)
    batch = batch_graphs(_mols(rs, 128, with_esp=True),
                         global_keys=("energy", "total_charge"))

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

    @jax.jit
    def step(p, o, b):
        (l, _), g = jax.value_and_grad(loss_fn, has_aux=True)(p, b)
        u, o = opt.update(g, o, p)
        return optax.apply_updates(p, u), o, l

    out = step(params, ostate, batch)
    jax.block_until_ready(out)

    tmpdir = tempfile.mkdtemp(prefix="jaxprof_hdnnp_")
    with jax.profiler.trace(tmpdir):
        for _ in range(10):
            out = step(params, ostate, batch)
        jax.block_until_ready(out)

    paths = glob.glob(os.path.join(tmpdir, "**", "*.xplane.pb"),
                      recursive=True)
    assert paths, f"no xplane.pb under {tmpdir}"
    totals, counts = aggregate_xplane(paths[0])
    gross = sum(totals.values())
    print(json.dumps({"total_us_all_lines": round(gross, 1)}))
    for name, us in totals.most_common(45):
        print(f"{us/10:10.1f} us/step  x{counts[name]//10:<4d} {name[:110]}")


if __name__ == "__main__":
    main()
