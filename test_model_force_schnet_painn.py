"""Golden-IO parity harness for SchNet/PAiNN force models (parity: reference
``test_model_force_schnet_painn.py``, 212 LoC): feed recorded input files
(input_NN.txt: z, x y z rows) to a trained checkpoint and compare
energy/forces against a recorded golden — the cross-engine MD parity check
for the non-HDNNP potentials.

Record mode writes the golden file from the current checkpoint; check mode
compares against it. Shares the input format and tolerance logic with
``test_model_force_hdnnp.py`` but without charges/ESP columns or angle
preprocessing.
"""
from __future__ import annotations

import argparse
import glob
import json

import numpy as np

from test_model_force_hdnnp import read_input_file, predict


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--script", default="force_schnet",
                    choices=["force_schnet", "force_painn"])
    ap.add_argument("--inputs", default="input_*.txt")
    ap.add_argument("--golden", default="output.json")
    ap.add_argument("--cutoff", type=float, default=5.0)
    ap.add_argument("--record", action="store_true",
                    help="write the golden file instead of checking")
    ap.add_argument("--atol", type=float, default=1e-4)
    args = ap.parse_args()

    paths = sorted(glob.glob(args.inputs))
    if not paths:
        raise SystemExit(f"no input files match {args.inputs}")
    graphs = [read_input_file(p) for p in paths]
    results = predict(args.checkpoint, args.script, graphs,
                      cutoff=args.cutoff, need_angles=False)

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
        print(f"frame {i}: dE={de:.2e} dF={df:.2e}")
        ok &= de < args.atol and df < args.atol
    print("PASS" if ok else "FAIL")
    raise SystemExit(0 if ok else 1)


if __name__ == "__main__":
    main()
