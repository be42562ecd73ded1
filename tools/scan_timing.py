"""Ground-truth step timing: K train steps inside ONE jitted lax.scan.

Motivation: dispatch-loop timings through the tunneled chip disagree with
each other by up to 20x (bench.py's 50-iteration loop says ~11 ms/step;
tools/step_hlo_census.py measured 0.54 ms for the same step under load,
and a 1 GiB device copy apparently ran at 63 TB/s — impossible). A scan
folds K real steps into one device program: one dispatch, K sequential
executions whose total wall time divided by K is the true per-step cost,
immune to host/tunnel dispatch artifacts in either direction.

Prints one JSON line with dispatch-loop vs in-scan per-step times for the
SchNet E+F train step and for the 1 GiB copy.
"""
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
    import jax.numpy as jnp
    import optax

    from bench import bench_schnet_setup, _timeit

    out = {}

    # --- 1 GiB copy: dispatch loop vs scan --------------------------------
    # CAVEAT (r3): both copy numbers are NON-PHYSICAL (48-69 TB/s measured
    # on an 819 GB/s part) — XLA folds/fuses the +1 chains, so they measure
    # neither HBM nor the tunnel. Kept only as a fusion demonstration; the
    # calibrated bandwidth instrument is tools/profile_hbm_traffic.py. The
    # STEP numbers below are valid: optimizer state evolves every scan
    # iteration, so nothing folds.
    x = jnp.ones((256, 1024, 1024), jnp.float32)

    @jax.jit
    def cp(a):
        return a + 1.0

    y = cp(x)
    jax.block_until_ready(y)
    t0 = time.perf_counter()
    for _ in range(10):
        y = cp(y)
    jax.block_until_ready(y)
    out["copy_loop_gbps"] = round((2 * x.size * 4) * 10
                                  / (time.perf_counter() - t0) / 1e9, 1)

    @jax.jit
    def cp_scan(a):
        return jax.lax.scan(lambda c, _: (c + 1.0, ()), a, None,
                            length=10)[0]

    y = cp_scan(x)
    jax.block_until_ready(y)
    t0 = time.perf_counter()
    y = cp_scan(y)
    jax.block_until_ready(y)
    out["copy_scan_gbps"] = round((2 * x.size * 4) * 10
                                  / (time.perf_counter() - t0) / 1e9, 1)

    # --- SchNet train step: dispatch loop vs scan -------------------------
    step, (params, opt_state, batch), n_edges = bench_schnet_setup(
        jax, jnp, optax)
    dt_loop, _ = _timeit(step, (params, opt_state, batch), iters=50)
    out["step_loop_ms"] = round(dt_loop * 1e3, 3)

    k = 20

    @jax.jit
    def multi(params, opt_state, b):
        def body(carry, _):
            p, s = carry
            p, s, loss = step.__wrapped__(p, s, b)
            return (p, s), loss

        (p, s), losses = jax.lax.scan(body, (params, opt_state), None,
                                      length=k)
        return p, s, losses[-1]

    r = multi(params, opt_state, batch)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(3):
        r = multi(params, opt_state, batch)
    jax.block_until_ready(r)
    dt_scan = (time.perf_counter() - t0) / (3 * k)
    out["step_scan_ms"] = round(dt_scan * 1e3, 3)
    out["edges_per_sec_scan"] = round(n_edges / dt_scan, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
