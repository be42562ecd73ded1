"""Micro-benchmark: native C++ cell-list vs numpy O(N^2) neighbor search.

The neighbor list is rebuilt every MD step (moldyn pipeline) and once per
graph in dataset preprocessing — the dominant host-side cost for large
systems.
"""
import json
import time

import numpy as np

from gcnn_keras_tpu import native
from gcnn_keras_tpu.graph.preprocess import set_range, set_range_periodic


def bench(n, cutoff=3.0, k=25, density=0.05, repeats=3):
    rs = np.random.RandomState(n)
    box = (n / density) ** (1.0 / 3.0)
    xyz = rs.rand(n, 3) * box
    g = {"node_coordinates": xyz}
    out = {}
    for backend in ("numpy", "native"):
        if backend == "native" and not native.available():
            continue
        if backend == "numpy" and n > 5000:
            out[backend] = float("nan")  # O(N^2) matrix would be ~>3 GB
            continue
        ts = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            r = set_range(dict(g), max_distance=cutoff, max_neighbours=k,
                          backend=backend)
            ts.append(time.perf_counter() - t0)
        out[backend] = min(ts)
        out[f"{backend}_edges"] = int(len(r["range_indices"]))
    return out


def bench_periodic(n, cutoff=5.0, k=25, density=0.05, repeats=2):
    rs = np.random.RandomState(n)
    a = (n / density) ** (1.0 / 3.0)
    lat = np.diag([a, a, a])
    g = {"node_coordinates": rs.rand(n, 3) @ lat, "graph_lattice": lat}
    out = {}
    for backend in ("numpy", "native"):
        if backend == "native" and not native.available():
            continue
        if backend == "numpy" and n > 1000:
            out[backend] = float("nan")  # O(images * N^2) dense tensor
            continue
        ts = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            r = set_range_periodic(dict(g), max_distance=cutoff,
                                   max_neighbours=k, backend=backend)
            ts.append(time.perf_counter() - t0)
        out[backend] = min(ts)
        out[f"{backend}_edges"] = int(len(r["range_indices"]))
    return out


if __name__ == "__main__":
    for n in (1000, 5000, 20000, 100000, 500000):
        r = bench(n)
        spd = (r.get("numpy", float("nan")) / r["native"]
               if "native" in r else float("nan"))
        print(json.dumps({"n_atoms": n,
                          "numpy_s": round(r.get("numpy", float("nan")), 4),
                          "native_s": round(r.get("native", float("nan")), 4),
                          "speedup": round(spd, 1)}))
    for n in (1000, 20000, 100000, 500000):
        r = bench_periodic(n)
        spd = (r.get("numpy", float("nan")) / r["native"]
               if "native" in r else float("nan"))
        print(json.dumps({"n_atoms": n, "periodic": True,
                          "numpy_s": round(r.get("numpy", float("nan")), 4),
                          "native_s": round(r.get("native", float("nan")), 4),
                          "speedup": round(spd, 1)}))
