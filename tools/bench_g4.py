"""Isolate the ACSF G4 cost at flagship bench shapes on the real chip:
scan-timed (a) G4 descriptor forward, (b) G4 forward+backward (vjp wrt
positions — the force-path traversal), for the current implementation and
(when present) the fused Pallas kernel. One JSON line."""
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
    from gcnn_keras_tpu.layers.conv.acsf import ACSFG4

    rs = np.random.RandomState(1)
    batch = batch_graphs(_mols(rs, 128, with_esp=True),
                         global_keys=("energy", "total_charge"))
    n_angles = int(np.asarray(batch.angle_mask).sum())
    elements = [1, 6, 7, 8, 9]
    kwargs = ACSFG4.make_param_table(
        eta=[0.0, 0.3], lamda=[-1.0, 1.0], rc=4.0, zeta=[1.0, 8.0],
        elements=elements, multiplicity=2.0)
    record = {"n_angles": n_angles, "A_pad": int(batch.angles.shape[0])}

    variants = {"current": {}}
    try:
        from gcnn_keras_tpu.ops.pallas import fused_g4  # noqa: F401
        variants["fused"] = {"fused": True}
    except ImportError:
        pass

    for name, extra in variants.items():
        layer = ACSFG4(**kwargs, **extra)
        params = layer.init(jax.random.PRNGKey(0), batch)
        pos0 = batch.nodes["node_coordinates"]

        def fwd(p):
            return layer.apply(params, batch, positions=p)

        @jax.jit
        def many_fwd(p, k=20):
            def body(c, _):
                out = fwd(c)
                # fold output back so the loop cannot be collapsed
                c = c + 1e-12 * jnp.sum(out)
                return c, jnp.sum(out)
            _, outs = jax.lax.scan(body, p, None, length=k)
            return outs[-1]

        @jax.jit
        def many_grad(p, k=20):
            def body(c, _):
                g = jax.grad(lambda q: jnp.sum(fwd(q) ** 2))(c)
                return c + 1e-12 * g, jnp.sum(g)
            _, outs = jax.lax.scan(body, p, None, length=k)
            return outs[-1]

        for label, fn in (("fwd", many_fwd), ("fwd_bwd", many_grad)):
            out = fn(pos0)
            jax.block_until_ready(out)
            t0 = time.perf_counter()
            for _ in range(3):
                out = fn(pos0)
            jax.block_until_ready(out)
            dt = (time.perf_counter() - t0) / 3 / 20
            record[f"{name}_{label}_ms"] = round(dt * 1e3, 3)
            record[f"{name}_{label}_angles_per_sec"] = round(n_angles / dt, 0)
    print(json.dumps(record))


if __name__ == "__main__":
    main()
