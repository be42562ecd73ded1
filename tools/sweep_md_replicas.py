"""Replica-ensemble ScannedMD scaling sweep on the real chip (VERDICT r3
item 10): 21-atom SchNet NVE replicas in ONE disjoint-batched scanned
segment, S = 64..512 — prints us/replica-step and aggregate replica-steps/s
per S as one JSON line for PERF.md."""
import json
import sys
import time
import os

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from gcnn_keras_tpu.batch import batch_graphs
    from gcnn_keras_tpu.graph.preprocess import set_range
    from gcnn_keras_tpu.models.schnet import make_model
    from gcnn_keras_tpu.moldyn.trajectory import ScannedMD

    n = 21
    t = np.arange(n) * 1.2

    def system(seed):
        r = np.random.RandomState(seed)
        p = np.stack([t, 1.5 * np.sin(t * 0.9), 1.5 * np.cos(t * 0.7)], 1)
        return {"node_number": r.choice([1, 6, 7, 8], size=n),
                "node_coordinates":
                    (p + r.randn(n, 3) * 0.1).astype(np.float32)}

    model = make_model()
    g0 = dict(system(0))
    g0["energy"] = np.zeros(1, np.float32)
    g0 = set_range(g0, max_distance=4.0, max_neighbours=25)
    g0["edge_indices"] = g0.pop("range_indices")
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 batch_graphs([g0], global_keys=("energy",)))

    rows = []
    for S in (64, 128, 256, 512):
        systems = [system(100 + s) for s in range(S)]
        md = ScannedMD(model, params, dt=5e-4, segment_steps=500,
                       max_distance=4.0, max_neighbours=25)
        md.run_ensemble(systems, n_segments=1)  # compile + warm
        t0 = time.perf_counter()
        md.run_ensemble(systems, n_segments=4)
        dt = (time.perf_counter() - t0) / (4 * 500)
        rows.append({"replicas": S,
                     "us_per_replica_step": round(dt / S * 1e6, 2),
                     "replica_steps_per_sec": round(S / dt, 0)})
        print(f"S={S}: {rows[-1]}", file=sys.stderr, flush=True)
    print(json.dumps({"sweep": rows, "atoms": n,
                      "segment_steps": 500}))


if __name__ == "__main__":
    main()
