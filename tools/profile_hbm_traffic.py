"""Measure REAL HBM traffic of the bench train step with jax.profiler
(VERDICT r2 item 7: replace the XLA cost-analysis bytes whose Pallas
re-count implies >1x HBM peak).

Strategy: capture an xplane trace of N steps, then parse the TensorCore
device plane with tensorboard_plugin_profile's protobuf bindings and sum
per-op statistics. TPU xplanes carry per-op ``bytes_accessed`` (the
compiler's estimate attached to executed ops — still static per op, but
summed over ops ACTUALLY RUN, which fixes the double-count class) and
exact op durations. Also times a pure HBM copy as a measured-bandwidth
calibration for this chip+host.

Prints one JSON line; consumed by hand into bench.py/PERF.md.
"""
import glob
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def measured_copy_gbps(jax, jnp):
    """Achieved HBM bandwidth of a big device copy (read+write)."""
    x = jnp.ones((256, 1024, 1024), jnp.float32)  # 1 GiB

    @jax.jit
    def cp(a):
        return a + 1.0

    y = cp(x)
    jax.block_until_ready(y)
    t0 = time.perf_counter()
    for _ in range(10):
        y = cp(y)
    jax.block_until_ready(y)
    dt = (time.perf_counter() - t0) / 10
    return (2 * x.size * 4) / dt / 1e9


def parse_xplane(logdir):
    """Sum durations/stats per op name on the device planes."""
    from tensorboard_plugin_profile.protobuf import xplane_pb2
    paths = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                      recursive=True)
    if not paths:
        return None
    xs = xplane_pb2.XSpace()
    with open(sorted(paths)[-1], "rb") as f:
        xs.ParseFromString(f.read())
    planes = {}
    for plane in xs.planes:
        stat_names = {m.id: m.name for m in plane.stat_metadata.values()}
        ev_names = {m.id: m.name for m in plane.event_metadata.values()}
        total_dur = 0
        stat_sums = {}
        n_events = 0
        for line in plane.lines:
            for ev in line.events:
                n_events += 1
                total_dur += ev.duration_ps
                for st in ev.stats:
                    name = stat_names.get(st.metadata_id, str(st.metadata_id))
                    val = (st.value.int64_value or st.value.uint64_value
                           or st.value.double_value)
                    if isinstance(val, (int, float)) and val:
                        stat_sums[name] = stat_sums.get(name, 0) + val
        planes[plane.name] = {
            "events": n_events,
            "total_dur_ms": total_dur / 1e9,
            "stats": {k: v for k, v in sorted(
                stat_sums.items(), key=lambda kv: -abs(kv[1]))[:25]},
        }
    return planes


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import optax

    from bench import bench_schnet_setup  # type: ignore

    copy_gbps = measured_copy_gbps(jax, jnp)
    print(f"copy bandwidth: {copy_gbps:.1f} GB/s", file=sys.stderr)

    step, args, _ = bench_schnet_setup(jax, jnp, optax)
    out = step(*args)
    jax.block_until_ready(out)

    logdir = "/tmp/jax_trace_bench"
    os.system(f"rm -rf {logdir}")
    with jax.profiler.trace(logdir):
        for _ in range(5):
            out = step(*args)
        jax.block_until_ready(out)

    planes = parse_xplane(logdir)
    result = {"copy_gbps": round(copy_gbps, 1)}
    if planes:
        for name, info in planes.items():
            key = name.replace("/", "_").replace(" ", "_")[:60]
            result[key] = {"events": info["events"],
                           "total_dur_ms": round(info["total_dur_ms"], 3),
                           "stats": {k: round(v, 1) if isinstance(v, float)
                                     else v
                                     for k, v in info["stats"].items()}}
    print(json.dumps(result))


if __name__ == "__main__":
    main()
