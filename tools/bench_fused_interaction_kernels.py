"""Micro-bench the three fused-interaction kernels standalone at bench
shapes (512-mol SchNet: E~55k, N_pad 8192, U=128), against the unfused
XLA chain equivalents. Scan-timed. One JSON line."""
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

    from bench import _mols
    from gcnn_keras_tpu.batch import batch_graphs
    from gcnn_keras_tpu.ops.pallas import fused_interaction as fi

    rs = np.random.RandomState(0)
    batch = batch_graphs(_mols(rs, 512), global_keys=("energy",))
    st = fi.CFStatic(bins=20, distance_max=4.0, offset=0.0, sigma=0.4,
                     units=128)
    n_node = batch.n_node
    x = jnp.asarray(rs.randn(n_node, 128).astype(np.float32))
    pos = batch.nodes["node_coordinates"]
    w1 = jnp.asarray((rs.randn(20, 128) * 0.3).astype(np.float32))
    b1 = jnp.asarray((rs.randn(128) * 0.1).astype(np.float32))
    w2 = jnp.asarray((rs.randn(128, 128) * 0.2).astype(np.float32))
    b2 = jnp.asarray((rs.randn(128) * 0.1).astype(np.float32))
    w1a, w2a = fi._augment(w1, b1, w2, b2, st)
    ct = jnp.asarray(rs.randn(n_node, 128).astype(np.float32))
    u_x = jnp.asarray(rs.randn(n_node, 128).astype(np.float32))
    u_pos = jnp.asarray(rs.randn(n_node, 3).astype(np.float32))
    send, recv, mask = batch.senders, batch.receivers, batch.edge_mask
    record = {"n_edges": int(np.asarray(mask).sum()), "n_node": n_node}

    def scan_time(fn, label, k=20, reps=3):
        @jax.jit
        def multi(seed):
            def body(c, _):
                out = fn(c)
                s = sum(jnp.sum(jnp.asarray(o, jnp.float32) * 1e-30)
                        for o in jax.tree.leaves(out))
                return c + s, ()
            c, _ = jax.lax.scan(body, seed, None, length=k)
            return c
        out = multi(jnp.float32(0.0))
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = multi(jnp.float32(0.0))
        jax.block_until_ready(out)
        record[label] = round((time.perf_counter() - t0) / reps / k * 1e3,
                              3)
        print(json.dumps({label: record[label]}), flush=True)

    scan_time(lambda c: fi._cf_fwd(x + c, pos, w1a, w2a, send, recv, mask,
                                   st, n_node), "fwd_ms")
    scan_time(lambda c: fi._cf_vjp(x + c, pos, w1a, w2a, ct, send, recv,
                                   mask, st, n_node), "vjp_ms")
    scan_time(lambda c: fi._cf_hesjvp(x + c, pos, w1a, w2a, ct, u_x,
                                      u_pos, w1a * 0.1, w2a * 0.1, send,
                                      recv, mask, st, n_node), "hesjvp_ms")

    # unfused equivalents (XLA): forward chain and its one-ct vjp
    from gcnn_keras_tpu.layers.geometry import gauss_basis

    def ref_fwd(x_):
        v = pos[send] - pos[recv]
        d = jnp.sqrt(jnp.maximum(jnp.sum(v * v, -1, keepdims=True), 1e-12))
        b = gauss_basis(d, 20, 4.0, 0.0, 0.4) * mask[:, None]
        f = (jax.nn.softplus(b @ w1 + b1) - 0.6931471805599453) @ w2 + b2
        m = f * x_[send]
        return jax.ops.segment_sum(m, recv, n_node,
                                   indices_are_sorted=True)

    scan_time(lambda c: ref_fwd(x + c), "xla_fwd_ms")
    scan_time(lambda c: jax.vjp(ref_fwd, x + c)[1](ct), "xla_vjp_x_ms")

    print(json.dumps(record))


if __name__ == "__main__":
    main()
