"""Load a trained checkpoint and run a prediction (parity: reference
``load_model.py``, 103 LoC)."""
from __future__ import annotations

import argparse
import json

import numpy as np


def main():
    from gcnn_keras_tpu.utils.devices import honor_platform_env
    honor_platform_env()
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--script", default="force_hdnnp4th")
    ap.add_argument("--data-path", default=None)
    ap.add_argument("--n-frames", type=int, default=4)
    args = ap.parse_args()

    import importlib
    from gcnn_keras_tpu.utils.checkpoint import load_checkpoint
    from gcnn_keras_tpu.training.force_script import load_force_dataset

    mod = importlib.import_module(args.script)
    # merge the engine defaults like run_force_training does — scripts that
    # delegate to force_script (charge_/energy_*) rely on keys like
    # "cutoff" existing
    from gcnn_keras_tpu.training.force_script import DEFAULTS
    cfg = dict(DEFAULTS)
    cfg.update(mod.CONFIG)
    if args.data_path:
        cfg["data_path"] = args.data_path
    ds = mod.load_dataset(cfg) if hasattr(mod, "load_dataset") \
        else load_force_dataset(cfg)
    ds = ds[list(range(min(args.n_frames, len(ds))))]
    fmodel = mod.build_model(cfg)
    state = load_checkpoint(args.checkpoint)

    batch = ds.to_batch(global_keys=("energy", "total_charge"))
    out = fmodel.apply(state["params"], batch, train=False)
    gm = np.asarray(batch.globals["graph_mask"])
    print(json.dumps({
        "energies": np.asarray(out["energy"])[gm].reshape(-1).tolist(),
        "has_forces": "force" in out,
        "has_charges": "charge" in out,
    }, indent=2))


if __name__ == "__main__":
    main()
