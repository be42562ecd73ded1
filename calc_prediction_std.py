"""Inter-model prediction std (parity: reference ``calc_prediction_std.py``,
272 LoC): ensemble disagreement as an active-learning signal — frames whose
force std exceeds a threshold are flagged for recomputation."""
from __future__ import annotations

import argparse
import json

import numpy as np

from evaluate_models import load_ensemble, predict_ensemble


def main():
    from gcnn_keras_tpu.utils.devices import honor_platform_env
    honor_platform_env()
    ap = argparse.ArgumentParser()
    ap.add_argument("--prefix", default="model_energy_force")
    ap.add_argument("--script", default="force_hdnnp4th")
    ap.add_argument("--data-path", default=None)
    ap.add_argument("--threshold", type=float, default=None,
                    help="flag frames with max force std above this")
    args = ap.parse_args()

    import importlib
    from gcnn_keras_tpu.training.force_script import (load_force_dataset,
                                                      script_config)
    mod = importlib.import_module(args.script)
    cfg = script_config(mod, data_path=args.data_path)
    if hasattr(mod, "load_dataset"):
        ds = mod.load_dataset(cfg)
    else:
        ds = load_force_dataset(cfg)
    members = load_ensemble(args.prefix, mod.build_model, cfg)

    batch = ds.to_batch(global_keys=("energy", "total_charge"))
    preds = predict_ensemble(members, batch, graphs=list(ds))
    nm = np.asarray(batch.node_mask)
    gid = np.asarray(batch.graph_id)
    report = {}
    if "force" in preds:
        f_std = preds["force"].std(axis=0)  # (N, 3)
        per_frame = []
        for g in range(len(ds)):
            sel = nm & (gid == g)
            per_frame.append(float(f_std[sel].max()) if sel.any() else 0.0)
        report["force_std_max_per_frame"] = per_frame
        report["force_std_mean"] = float(np.mean(per_frame))
        if args.threshold is not None:
            flagged = [i for i, v in enumerate(per_frame) if v > args.threshold]
            report["flagged_frames"] = flagged
    if "energy" in preds:
        gm = np.asarray(batch.globals["graph_mask"])
        e_std = preds["energy"].std(axis=0)[gm]
        report["energy_std_per_frame"] = [float(v) for v in e_std.reshape(-1)]
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
