"""Per-stage model evaluation with the reference's artifact set (parity:
``/root/reference/force_hdnnp4th.py`` ``evaluate_model`` — the per-stage
block every fork ``force_*.py`` defines and ``evaluate_models.py``
delegates to).

For each model the following land in ``output_dir``:

- ``errors{i}.json``: Train/Val/Test RMSE, MAE and R2 for charge, energy
  and force (reference key naming, e.g. ``"Test RMSE Force"``).
- ``predict_charge{i}.png`` / ``predict_energy{i}.png`` /
  ``predict_force{i}.png``: test-set predict-vs-true scatters.
- ``geoms{i}.extxyz``: test-set geometries with reference AND predicted
  energies/forces/charges as extra columns (``HDNNP_geoms.extxyz``
  analog, readable by ``mol/io.py:read_extxyz_file``).
- ``charge_predictions{i}.csv`` / ``energy_predictions{i}.csv`` /
  ``force_predictions{i}.csv``: flat reference/prediction columns with
  element types (the reference's lmplot DataFrames, saved as CSV — the
  seaborn lmplot rendering is replaced by ``plot_predict_true``).
"""
from __future__ import annotations

import json
import os
from typing import Dict, Optional, Sequence, Tuple

import numpy as np


def _element_symbol(z: int) -> str:
    from ..mol.io import PERIODIC_TABLE
    return PERIODIC_TABLE[z] if 0 <= z < len(PERIODIC_TABLE) else str(z)


def _metrics(true: np.ndarray, pred: np.ndarray) -> Tuple[float, float, float]:
    true = np.asarray(true, np.float64).reshape(-1)
    pred = np.asarray(pred, np.float64).reshape(-1)
    err = pred - true
    rmse = float(np.sqrt(np.mean(err * err)))
    mae = float(np.mean(np.abs(err)))
    ss_tot = float(np.sum((true - true.mean()) ** 2))
    r2 = float(1.0 - np.sum(err * err) / ss_tot) if ss_tot > 0 else float("nan")
    return rmse, mae, r2


def _write_csv(path: str, columns: Dict[str, np.ndarray]):
    keys = list(columns)
    rows = len(next(iter(columns.values())))
    with open(path, "w") as f:
        f.write(",".join(keys) + "\n")
        for i in range(rows):
            f.write(",".join(str(columns[k][i]) for k in keys) + "\n")


def _predict_stage(stage_ds, fmodel, params, global_keys, batch_size):
    """Predict a whole split in LOADER-SIZED chunks (never one giant
    padded batch — a full train split in one batch OOMs or forces a
    one-off multi-minute compile at 10-50x the trained shape). Returns
    dataset-ordered concatenated arrays of REAL entries only."""
    from ..data.loader import GraphBatchLoader

    graphs = list(stage_ds)
    hint = stage_ds.batch_shape_hint(min(batch_size, len(graphs))) \
        if hasattr(stage_ds, "batch_shape_hint") else {}
    loader = GraphBatchLoader(graphs, min(batch_size, len(graphs)),
                              shuffle=False, drop_last=False,
                              global_keys=global_keys, **hint)
    pred_e, true_e, pred_f, true_f, pred_q, true_q = [], [], [], [], [], []
    has_f = has_q = False
    for batch in loader:
        out = {k: np.asarray(v) for k, v in
               fmodel.apply(params, batch, train=False).items()
               if hasattr(v, "shape")}
        gm = np.asarray(batch.globals["graph_mask"], bool).reshape(-1)
        nm = np.asarray(batch.node_mask, bool)
        pred_e.append(out["energy"].reshape(batch.n_graphs, -1)[:, 0][gm])
        true_e.append(np.asarray(batch.globals["energy"]).reshape(
            batch.n_graphs, -1)[:, 0][gm])
        if "force" in out and "force" in batch.nodes:
            has_f = True
            pred_f.append(out["force"][nm])
            true_f.append(np.asarray(batch.nodes["force"])[nm])
        if "charge" in out and "charge" in batch.nodes:
            has_q = True
            pred_q.append(out["charge"].reshape(len(nm), -1)[:, 0][nm])
            true_q.append(np.asarray(
                batch.nodes["charge"]).reshape(len(nm), -1)[:, 0][nm])
    res = {"pred_e": np.concatenate(pred_e), "true_e": np.concatenate(true_e)}
    if has_f:
        res["pred_f"] = np.concatenate(pred_f)
        res["true_f"] = np.concatenate(true_f)
    if has_q:
        res["pred_q"] = np.concatenate(pred_q)
        res["true_q"] = np.concatenate(true_q)
    return res


def evaluate_model(ds, fmodel, params,
                   indices: Sequence[np.ndarray],
                   scaler=None, model_index: Optional[int] = None,
                   output_dir: str = "", dataset_name: str = "",
                   model_name: str = "model",
                   global_keys: Tuple[str, ...] = ("energy", "total_charge"),
                   make_plots: bool = True,
                   eval_batch_size: int = 32) -> Dict[str, float]:
    """Evaluate on train/val/test splits and write the artifact set above.

    ``indices``: (train_idx, val_idx, test_idx) — empty arrays skip a
    stage (the reference's behavior; ``evaluate_models.py`` passes empty
    train/val to evaluate checkpoints on a test split only). The
    per-sample artifacts (extxyz/CSVs/PNGs) are written ONLY from the
    TEST stage; with an empty test split only errors{i}.json is produced
    (they must never silently come from val/train data). ``scaler``:
    the fold's fitted EnergyForceExtensiveLabelScaler; the dataset is
    expected in TRANSFORMED (training) space and BOTH predictions and
    targets are inverse-transformed, so all reported metrics and artifacts
    are in raw label units (the reference evaluates after
    ``scaler.inverse_transform``). Returns the error dict."""
    suffix = f"_{model_index}" if model_index is not None else ""
    if output_dir:
        os.makedirs(output_dir, exist_ok=True)

    error_dict: Dict[str, float] = {}
    flats = {}
    test_stage = None
    for stage, idx in zip(("train", "val", "test"), indices):
        idx = np.asarray(idx, dtype=np.int64).reshape(-1)
        if idx.size == 0:
            continue
        stage_ds = ds[idx]
        res = _predict_stage(stage_ds, fmodel, params, global_keys,
                             eval_batch_size)
        z_list = [np.asarray(g["node_number"]) for g in stage_ds]

        pred_e, true_e = res["pred_e"], res["true_e"]
        if scaler is not None and getattr(scaler, "scale_", None) is not None:
            pred_e = scaler.inverse_transform(pred_e, z_list)
            true_e = scaler.inverse_transform(true_e, z_list)
        stage_flats = {"energy": (true_e, pred_e)}

        if "pred_f" in res:
            pred_f, true_f = res["pred_f"], res["true_f"]
            if scaler is not None and getattr(scaler, "scale_", None) is not None:
                pred_f = pred_f * float(scaler.scale_[0])
                true_f = true_f * float(scaler.scale_[0])
            stage_flats["force"] = (true_f, pred_f)
        if "pred_q" in res:
            stage_flats["charge"] = (res["true_q"], res["pred_q"])

        for label, (tv, pv) in stage_flats.items():
            rmse, mae, r2 = _metrics(tv, pv)
            error_dict[f"{stage.title()} RMSE {label.title()}"] = rmse
            error_dict[f"{stage.title()} MAE {label.title()}"] = mae
            error_dict[f"{stage.title()} R2 {label.title()}"] = r2
        if stage == "test":
            flats = stage_flats
            test_stage = (stage_ds, res, z_list)

    with open(os.path.join(output_dir, f"errors{suffix}.json"), "w") as f:
        json.dump(error_dict, f, indent=2, sort_keys=True)

    if test_stage is None:
        return error_dict

    stage_ds, res, z_list = test_stage
    # extxyz with ref+pred columns for the TEST stage — in RAW label units
    # like every other artifact (``flats`` already holds the
    # inverse-transformed, dataset-ordered real entries)
    from ..utils.save_load_utils import save_extxyz
    frames = []
    offset_n = 0
    ref_e_full, pred_e_full = flats["energy"]
    for gi, g in enumerate(stage_ds):
        n = len(np.asarray(g["node_number"]))
        fr = {"node_number": np.asarray(g["node_number"]),
              "node_coordinates": np.asarray(g["node_coordinates"]),
              "ref_energy": np.asarray(ref_e_full[gi:gi + 1]),
              "pred_energy": np.asarray(pred_e_full[gi:gi + 1])}
        if "force" in flats:
            true_f, pred_f = flats["force"]
            fr["ref_forces"] = np.asarray(true_f[offset_n:offset_n + n])
            fr["pred_forces"] = np.asarray(pred_f[offset_n:offset_n + n])
        if "charge" in flats:
            true_q, pred_q = flats["charge"]
            fr["ref_charges"] = np.asarray(true_q[offset_n:offset_n + n])
            fr["pred_charges"] = np.asarray(pred_q[offset_n:offset_n + n])
        frames.append(fr)
        offset_n += n
    save_extxyz(os.path.join(output_dir, f"geoms{suffix}.extxyz"), frames,
                array_keys=("ref_forces", "pred_forces", "ref_charges",
                            "pred_charges"),
                info_keys=("ref_energy", "pred_energy"))

    # flat ref/pred CSVs with element types (the reference's lmplot data)
    at_types = np.concatenate([[_element_symbol(int(zz)) for zz in z]
                               for z in z_list])
    for label, (tv, pv) in flats.items():
        cols = {f"{label}_reference": np.asarray(tv).reshape(-1),
                f"{label}_prediction": np.asarray(pv).reshape(-1)}
        per_atom = len(cols[f"{label}_reference"]) % len(at_types) == 0 \
            and label != "energy"
        if per_atom:
            rep = len(cols[f"{label}_reference"]) // len(at_types)
            cols["at_types"] = np.repeat(at_types, rep)
        _write_csv(os.path.join(output_dir,
                                f"{label}_predictions{suffix}.csv"), cols)

    if make_plots:
        from ..utils.plots import plot_predict_true
        units = {"charge": "e", "energy": "eV", "force": "eV/A"}
        for label, (tv, pv) in flats.items():
            plot_predict_true(np.asarray(pv), np.asarray(tv),
                              data_unit=units.get(label, ""),
                              model_name=model_name,
                              dataset_name=dataset_name,
                              target_names=label.title(),
                              filepath=output_dir or ".",
                              file_name=f"predict_{label}{suffix}.png")
    return error_dict
