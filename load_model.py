"""Load a trained checkpoint and run a prediction (parity: reference
``load_model.py``, 103 LoC)."""
from __future__ import annotations

import argparse
import json

import numpy as np


def load_and_predict(checkpoint: str, script: str = "force_hdnnp4th",
                     data_path: str | None = None, n_frames: int = 4) -> dict:
    """Restore a checkpoint trained by ``script`` and predict ``n_frames``
    frames of its dataset. The config merge mirrors ``run_force_training``:
    engine DEFAULTS under the script CONFIG — scripts that delegate to
    force_script (charge_/energy_*) rely on keys like "cutoff" existing
    (pinned by tests/test_force_script.py)."""
    import importlib
    from gcnn_keras_tpu.utils.checkpoint import load_checkpoint
    from gcnn_keras_tpu.training.force_script import (load_force_dataset,
                                                      script_config)

    mod = importlib.import_module(script)
    cfg = script_config(mod, data_path=data_path)
    ds = mod.load_dataset(cfg) if hasattr(mod, "load_dataset") \
        else load_force_dataset(cfg)
    ds = ds[list(range(min(n_frames, len(ds))))]
    fmodel = mod.build_model(cfg)
    state = load_checkpoint(checkpoint)

    batch = ds.to_batch(global_keys=("energy", "total_charge"))
    out = fmodel.apply(state["params"], batch, train=False)
    gm = np.asarray(batch.globals["graph_mask"])
    return {
        "energies": np.asarray(out["energy"])[gm].reshape(-1).tolist(),
        "has_forces": "force" in out,
        "has_charges": "charge" in out,
    }


def main():
    from gcnn_keras_tpu.utils.devices import honor_platform_env
    honor_platform_env()
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--script", default="force_hdnnp4th")
    ap.add_argument("--data-path", default=None)
    ap.add_argument("--n-frames", type=int, default=4)
    args = ap.parse_args()
    print(json.dumps(load_and_predict(args.checkpoint, args.script,
                                      args.data_path, args.n_frames),
                     indent=2))


if __name__ == "__main__":
    main()
