"""Golden-IO parity harness (parity: reference ``test_model_force_hdnnp.py``,
232 LoC): feed recorded input files (input_NN.txt: z, xyz, charges/esp) to a
trained checkpoint and compare charges/energy/forces against a recorded
output.txt — doubles as the cross-engine MD parity check.

Record mode writes the golden files from the current checkpoint; check mode
compares against them.
"""
from __future__ import annotations

import argparse
import glob
import json
import os

import numpy as np


def read_input_file(path):
    """input_NN.txt: line 1 = natoms, then z x y z [q esp] rows."""
    with open(path) as f:
        lines = [ln.split() for ln in f if ln.strip()]
    n = int(lines[0][0])
    rows = lines[1:1 + n]
    z = np.array([int(float(r[0])) for r in rows], dtype=np.int64)
    xyz = np.array([[float(v) for v in r[1:4]] for r in rows], dtype=np.float32)
    g = {"node_number": z, "node_coordinates": xyz,
         "total_charge": np.array([0.0], dtype=np.float32)}
    if len(rows[0]) > 4:
        g["esp"] = np.array([float(r[4]) for r in rows], dtype=np.float32)
        g["esp_grad"] = np.zeros((n, 3), dtype=np.float32)
    return g


def predict(checkpoint, script, graphs, cutoff=6.0, need_angles=True):
    import importlib
    import jax
    from gcnn_keras_tpu.utils.devices import honor_platform_env
    honor_platform_env()
    from gcnn_keras_tpu.utils.checkpoint import load_checkpoint
    from gcnn_keras_tpu.graph.preprocess import set_range, set_angle
    from gcnn_keras_tpu.batch import batch_graphs

    mod = importlib.import_module(script)
    fmodel = mod.build_model(dict(mod.CONFIG))
    state = load_checkpoint(checkpoint)
    prepared = []
    for g in graphs:
        g = set_range(dict(g), max_distance=cutoff, max_neighbours=25)
        g["edge_indices"] = g["range_indices"]
        if need_angles:
            g = set_angle(g, range_indices="edge_indices")
        prepared.append(g)
    batch = batch_graphs(prepared, global_keys=("total_charge",))
    out = fmodel.apply(state["params"], batch, train=False)
    results = []
    nm = np.asarray(batch.node_mask)
    gid = np.asarray(batch.graph_id)
    for i in range(len(graphs)):
        sel = nm & (gid == i)
        r = {"energy": float(np.asarray(out["energy"])[i].reshape(-1)[0]),
             "force": np.asarray(out["force"])[sel].tolist()}
        if "charge" in out:
            r["charge"] = np.asarray(out["charge"])[sel].tolist()
        results.append(r)
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--script", default="force_hdnnp4th")
    ap.add_argument("--inputs", default="input_*.txt")
    ap.add_argument("--golden", default="output.json")
    ap.add_argument("--record", action="store_true",
                    help="write the golden file instead of checking")
    ap.add_argument("--atol", type=float, default=1e-4)
    args = ap.parse_args()

    paths = sorted(glob.glob(args.inputs))
    if not paths:
        raise SystemExit(f"no input files match {args.inputs}")
    graphs = [read_input_file(p) for p in paths]
    results = predict(args.checkpoint, args.script, graphs)

    if args.record:
        with open(args.golden, "w") as f:
            json.dump(results, f, indent=2)
        print(f"recorded {len(results)} goldens -> {args.golden}")
        return

    with open(args.golden) as f:
        golden = json.load(f)
    ok = True
    for i, (r, g) in enumerate(zip(results, golden)):
        de = abs(r["energy"] - g["energy"])
        df = np.abs(np.array(r["force"]) - np.array(g["force"])).max()
        line = f"frame {i}: dE={de:.2e} dF={df:.2e}"
        if "charge" in r and "charge" in g:
            dq = np.abs(np.array(r["charge"]) - np.array(g["charge"])).max()
            line += f" dq={dq:.2e}"
            ok &= dq < args.atol
        ok &= de < args.atol and df < args.atol
        print(line)
    print("PASS" if ok else "FAIL")
    raise SystemExit(0 if ok else 1)


if __name__ == "__main__":
    main()
