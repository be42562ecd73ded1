"""Sweep (variant, n_blk, e_blk, slots) of the Pallas sorted-segment-sum on
the real chip.

Hypothesis (PERF.md r2): the kernel is per-chunk-overhead bound (~5-7 us per
chunk iteration vs ~1 us of DMA+MXU work), so the levers are (a) fewer
chunks (bigger e_blk / n_blk), (b) fewer DMAs per chunk (v3 keeps the whole
receiver array in VMEM), (c) deeper DMA pipelining (v3 slots). Times each
config at bench-like shapes plus the XLA scatter baseline; every timed
config is verified against ``jax.ops.segment_sum`` first.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timeit(fn, *args, iters=200):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    # median of 5 batches of iters/5 — the tunneled chip is noisy
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(iters // 5):
            out = fn(*args)
        jax.block_until_ready(out)
        times.append((time.perf_counter() - t0) / (iters // 5))
    return sorted(times)[len(times) // 2]


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import functools

    from bench import _mols
    from gcnn_keras_tpu.batch import batch_graphs
    from gcnn_keras_tpu.ops.pallas.segment_sum import (
        _sorted_segment_sum_pallas, _sorted_segment_sum_pallas_v2,
        _sorted_segment_sum_pallas_v3)

    rs = np.random.RandomState(0)
    batch = batch_graphs(_mols(rs, 512), global_keys=("energy",))
    e = int(batch.receivers.shape[0])
    n = int(batch.n_node)
    f = 128
    vals = jnp.asarray(rs.randn(e, f).astype(np.float32))
    recv = jnp.asarray(np.asarray(batch.receivers), jnp.int32)
    print(f"E={e} N={n} F={f}", file=sys.stderr)

    ref = jax.ops.segment_sum(vals, recv, n, indices_are_sorted=True)
    results = {}
    base = jax.jit(functools.partial(
        jax.ops.segment_sum, num_segments=n, indices_are_sorted=True))
    results["xla_scatter"] = timeit(base, vals, recv) * 1e6

    configs = []
    for n_blk in (128, 256, 512):
        for e_blk in (1024, 2048, 4096):
            configs.append(("v1", _sorted_segment_sum_pallas,
                            dict(n_blk=n_blk, e_blk=e_blk)))
            for slots in (2, 4):
                configs.append(("v3", _sorted_segment_sum_pallas_v3,
                                dict(n_blk=n_blk, e_blk=e_blk, slots=slots)))
    configs.append(("v2", _sorted_segment_sum_pallas_v2,
                    dict(n_blk=256, e_blk=2048)))

    for tag, impl, kw in configs:
        key = tag + "_" + "_".join(f"{k[0]}{v}" for k, v in kw.items())
        fn = jax.jit(functools.partial(impl, num_segments=n, **kw))
        try:
            err = float(jnp.max(jnp.abs(fn(vals, recv) - ref)))
            scale = float(jnp.max(jnp.abs(ref)))
            assert err < 1e-2 * max(scale, 1.0), f"wrong result: {err}"
            us = timeit(fn, vals, recv) * 1e6
        except Exception as ex:
            us = None
            print(f"{key} failed: {ex}"[:300], file=sys.stderr)
        results[key] = us
        print(f"{key}: {None if us is None else round(us, 1)}",
              file=sys.stderr)
    print(json.dumps({k: (round(v, 1) if v else None)
                      for k, v in results.items()}))


if __name__ == "__main__":
    main()
