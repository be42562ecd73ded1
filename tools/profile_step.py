"""Per-op profile of the SchNet energy+force train step on the real chip.

Traces a few steps with jax.profiler, then parses the raw xplane.pb
(tensorboard's converter is broken in this environment) and prints the
top ops on the device plane by total self time.
"""
import collections
import glob
import json
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")


def aggregate_xplane(path, plane_filter=("TPU", "/device")):
    try:
        from tensorboard_plugin_profile.protobuf import xplane_pb2
    except ImportError:  # proto lives under tensorflow's tsl in this env
        from tensorflow.tsl.profiler.protobuf import xplane_pb2
    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())
    totals = collections.Counter()
    counts = collections.Counter()
    for plane in xs.planes:
        if not any(k.lower() in plane.name.lower() for k in plane_filter):
            continue
        emeta = {m.id: m.name for m in plane.event_metadata.values()}
        for line in plane.lines:
            if "XLA Ops" not in line.name and "Steps" not in line.name \
                    and line.name != "":
                pass
            for ev in line.events:
                name = emeta.get(ev.metadata_id, "?")
                totals[name] += ev.duration_ps / 1e6  # us
                counts[name] += 1
    return totals, counts


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import optax

    from bench import _mols, _timeit
    from gcnn_keras_tpu.batch import batch_graphs
    from gcnn_keras_tpu.models.schnet import make_model
    from gcnn_keras_tpu.model.force import EnergyForceModel
    from gcnn_keras_tpu.training.losses import masked_graph_mae, masked_node_mae

    rs = np.random.RandomState(0)
    batch = batch_graphs(_mols(rs, 512), global_keys=("energy",))

    fmodel = EnergyForceModel(make_model())
    # jit the init: EAGER flax init = thousands of ~10ms tunneled dispatches
    params = jax.jit(lambda k, b: fmodel.init(k, b, train=False))(
        jax.random.PRNGKey(0), batch)

    def loss_fn(p, b):
        out = fmodel.apply(p, b, train=False)
        e = masked_graph_mae(out["energy"], b.globals["energy"],
                             b.globals["graph_mask"])
        f = masked_node_mae(out["force"], b.nodes["force"], b.node_mask)
        return e + 100.0 * f, {}

    opt = optax.adam(1e-3)
    ostate = opt.init(params)

    @jax.jit
    def step(p, o, b):
        (l, _), g = jax.value_and_grad(loss_fn, has_aux=True)(p, b)
        u, o = opt.update(g, o, p)
        return optax.apply_updates(p, u), o, l

    out = step(params, ostate, batch)
    jax.block_until_ready(out)

    tmpdir = tempfile.mkdtemp(prefix="jaxprof_")
    with jax.profiler.trace(tmpdir):
        for _ in range(10):
            out = step(params, ostate, batch)
        jax.block_until_ready(out)

    paths = glob.glob(os.path.join(tmpdir, "**", "*.xplane.pb"),
                      recursive=True)
    assert paths, f"no xplane.pb under {tmpdir}"
    totals, counts = aggregate_xplane(paths[0])
    top = totals.most_common(40)
    gross = sum(totals.values())
    print(json.dumps({"total_us_all_lines": round(gross, 1)}))
    for name, us in top:
        print(f"{us/10:10.1f} us/step  x{counts[name]//10:<4d} {name[:110]}")


if __name__ == "__main__":
    main()
