"""Ensemble evaluation (parity: reference ``evaluate_models.py``, 246 LoC):
load an ensemble of checkpoints, predict on a dataset, report per-model and
ensemble-mean errors."""
from __future__ import annotations

import argparse
import glob
import json

import numpy as np


def load_ensemble(prefix: str, build_model, cfg):
    """Load (fmodel, params, scaler) for every ``{prefix}_*`` directory."""
    from gcnn_keras_tpu.utils.checkpoint import load_checkpoint
    from gcnn_keras_tpu.data.scalers import EnergyForceExtensiveLabelScaler
    members = []
    for d in sorted(glob.glob(f"{prefix}_*")):
        fmodel = build_model(cfg)
        state = load_checkpoint(d)
        scaler = EnergyForceExtensiveLabelScaler()
        try:
            scaler.load(f"{d}/scaler.json")
        except FileNotFoundError:
            scaler = None
        members.append((fmodel, state["params"], scaler))
    return members


def predict_ensemble(members, batch, graphs=None):
    """Stack per-member predictions in RAW units: each member's outputs are
    inverse-transformed with its own scaler (members are trained in scaled
    space, fit on their own fold). Returns dict of (n_members, ...)."""
    outs = []
    for fmodel, params, scaler in members:
        out = {k: np.asarray(v) for k, v in
               fmodel.apply(params, batch, train=False).items()
               if hasattr(v, "shape")}
        if scaler is not None and scaler.scale_ is not None and graphs is not None:
            z = [np.asarray(g["node_number"]) for g in graphs]
            gm = np.asarray(batch.globals["graph_mask"])
            e = out["energy"].reshape(batch.n_graphs, -1)[:, 0]
            e_raw = e.copy()
            e_raw[gm] = scaler.inverse_transform(e[gm], z)
            out["energy"] = e_raw[:, None]
            if "force" in out:
                out["force"] = out["force"] * scaler.scale_[0]
        outs.append(out)
    keys = outs[0].keys()
    return {k: np.stack([o[k] for o in outs]) for k in keys}


def main():
    from gcnn_keras_tpu.utils.devices import honor_platform_env
    honor_platform_env()
    ap = argparse.ArgumentParser()
    ap.add_argument("--prefix", default="model_energy_force")
    ap.add_argument("--script", default="force_hdnnp4th",
                    help="script module providing build_model + CONFIG")
    ap.add_argument("--data-path", default=None)
    ap.add_argument("--output-dir", default="evaluation_results",
                    help="per-model artifact directory (reference "
                         "evaluate_models.py --output-dir): errors{i}.json, "
                         "predict_*{i}.png, geoms{i}.extxyz, "
                         "*_predictions{i}.csv per ensemble member")
    ap.add_argument("--indices", default=None,
                    help="pickle with a dict holding 'test' indices "
                         "(reference load_indices); default = whole dataset "
                         "as the test stage")
    ap.add_argument("--conf", default=None,
                    help="JSON config override merged onto the script's "
                         "CONFIG (same semantics as the force_*.py --conf)")
    args = ap.parse_args()

    import importlib
    from gcnn_keras_tpu.training.force_script import script_config
    mod = importlib.import_module(args.script)
    cfg = script_config(mod)
    if args.conf:
        with open(args.conf) as f:
            cfg.update(json.load(f))
    # the CLI flag wins over a data_path inside --conf (parse_config_cli
    # order: CONFIG -> conf -> explicit flags)
    if args.data_path:
        cfg["data_path"] = args.data_path
    if hasattr(mod, "load_dataset"):
        ds = mod.load_dataset(cfg)
    else:
        from gcnn_keras_tpu.training.force_script import load_force_dataset
        ds = load_force_dataset(cfg)

    members = load_ensemble(args.prefix, mod.build_model, cfg)
    if not members:
        raise SystemExit(f"no checkpoints matching {args.prefix}_*")

    batch = ds.to_batch(global_keys=("energy", "total_charge"))
    preds = predict_ensemble(members, batch, graphs=list(ds))
    gm = np.asarray(batch.globals["graph_mask"])
    nm = np.asarray(batch.node_mask)
    report = {"n_members": len(members)}
    if "energy" in preds and "energy" in batch.globals:
        target = np.asarray(batch.globals["energy"])[gm]
        per = [np.abs(p[gm] - target).mean() for p in preds["energy"]]
        mean_pred = preds["energy"].mean(axis=0)
        report["energy_mae_per_model"] = [float(v) for v in per]
        report["energy_mae_ensemble"] = float(np.abs(mean_pred[gm] - target).mean())
    if "force" in preds and "force" in batch.nodes:
        target = np.asarray(batch.nodes["force"])[nm]
        per = [np.abs(p[nm] - target).mean() for p in preds["force"]]
        mean_pred = preds["force"].mean(axis=0)
        report["force_mae_per_model"] = [float(v) for v in per]
        report["force_mae_ensemble"] = float(np.abs(mean_pred[nm] - target).mean())

    # per-member per-stage artifact sets (reference evaluate_models.py
    # delegates to each fork script's evaluate_model; here the shared
    # evaluator writes errors{i}.json / predict_*{i}.png / geoms{i}.extxyz
    # / *_predictions{i}.csv into --output-dir)
    from gcnn_keras_tpu.training.evaluation import evaluate_model
    from gcnn_keras_tpu.data.dataset import MemoryGraphDataset
    if args.indices:
        import pickle
        with open(args.indices, "rb") as f:
            idx = pickle.load(f)
        indices = (np.array([], np.int64), np.array([], np.int64),
                   np.asarray(idx["test"]))
    else:
        indices = (np.array([], np.int64), np.array([], np.int64),
                   np.arange(len(ds)))
    for i, (fmodel, params, scaler) in enumerate(members):
        ds_m = MemoryGraphDataset(graphs=[dict(g) for g in ds])
        if scaler is not None:
            scaler.transform_dataset(ds_m)
        evaluate_model(ds_m, fmodel, params, indices, scaler=scaler,
                       model_index=i, output_dir=args.output_dir,
                       dataset_name=cfg.get("data_path") or "synthetic",
                       model_name=args.script)
    report["output_dir"] = args.output_dir
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
