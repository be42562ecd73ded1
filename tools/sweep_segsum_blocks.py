"""Sweep (n_blk, e_blk) of the Pallas sorted-segment-sum on the real chip.

Hypothesis (PERF.md r2): the kernel is per-chunk-overhead bound (~7 us per
grid/chunk iteration vs <1 us of DMA+MXU work), so larger blocks win.
Times the kernel at bench-like shapes plus the XLA scatter baseline.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timeit(fn, *args, iters=100):
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
    import functools

    from bench import _mols
    from gcnn_keras_tpu.batch import batch_graphs
    from gcnn_keras_tpu.ops.pallas.segment_sum import \
        _sorted_segment_sum_pallas

    rs = np.random.RandomState(0)
    batch = batch_graphs(_mols(rs, 512), global_keys=("energy",))
    e = int(batch.receivers.shape[0])
    n = int(batch.n_node)
    f = 128
    vals = jnp.asarray(rs.randn(e, f).astype(np.float32))
    recv = jnp.asarray(np.asarray(batch.receivers), jnp.int32)
    print(f"E={e} N={n} F={f}", file=sys.stderr)

    results = {}
    base = jax.jit(functools.partial(
        jax.ops.segment_sum, num_segments=n, indices_are_sorted=True))
    results["xla_scatter"] = timeit(base, vals, recv) * 1e6

    from gcnn_keras_tpu.ops.pallas.segment_sum import \
        _sorted_segment_sum_pallas_v2

    for tag, impl in (("v1", _sorted_segment_sum_pallas),
                      ("v2", _sorted_segment_sum_pallas_v2)):
        for n_blk in (128, 256):
            for e_blk in (512, 1024, 2048):
                fn = jax.jit(functools.partial(
                    impl, num_segments=n, n_blk=n_blk, e_blk=e_blk))
                try:
                    us = timeit(fn, vals, recv) * 1e6
                    ref = jax.ops.segment_sum(vals, recv, n,
                                              indices_are_sorted=True)
                    err = float(jnp.max(jnp.abs(fn(vals, recv) - ref)))
                    assert err < 1e-2, f"wrong result: {err}"
                except Exception as ex:
                    us = None
                    print(f"{tag} n{n_blk}/e{e_blk} failed: {ex}"[:300],
                          file=sys.stderr)
                results[f"{tag}_n{n_blk}_e{e_blk}"] = us
    print(json.dumps({k: (round(v, 1) if v else None)
                      for k, v in results.items()}))


if __name__ == "__main__":
    main()
