"""Flagship training script (parity: reference ``force_hdnnp4th.py``, 613
LoC): HDNNP4th + EnergyForceModel with charge/energy/force outputs,
normalized loss weights (reference :228-245 uses 50/1/200), k-fold ensemble
with swapped train/val thirds (:366), EnergyForceExtensiveLabelScaler,
linear LR decay, JSON config override via --conf, per-stage evaluation.
"""
from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

CONFIG = {
    "data_path": None,                 # pickled dataset from prepare_data.py
    "model_prefix": "model_energy_force",
    "charge_loss_weight": 50.0,
    "energy_loss_weight": 1.0,
    "force_loss_weight": 200.0,
    "epochs": 100,
    "batch_size": 16,
    "learning_rate_start": 1e-3,
    "learning_rate_stop": 1e-5,
    "ensemble_size": 3,
    "seed": 42,
    "steps_per_dispatch": 1,  # fuse K optimizer steps per jitted dispatch (PERF.md r3)
    # reference force_hdnnp4th.py:284-295: EarlyStopping patience
    # (0 = off, restore_best_weights on stop), optional wandb, plots
    "early_stopping": 0,
    "use_wandb": False,
    "wandb_project": "gcnn_keras_tpu",
    "make_plots": True,
    "elements": [1, 6, 16],
    "g2": {"eta": [0.0, 0.3], "rs": [0.0, 3.0], "rc": 10.0},
    "g4": {"eta": [0.0, 0.3], "lamda": [-1.0, 1.0], "zeta": [1.0, 8.0], "rc": 6.0},
    "mlp_units": [64, 64, 1],
    "synthetic_frames": 64,            # offline fallback dataset size
}


def build_model(cfg):
    from gcnn_keras_tpu.models.hdnnp4th import make_model_behler
    from gcnn_keras_tpu.model.force import EnergyForceModel
    elements = cfg["elements"]
    num_rel = max(elements) + 1
    model = make_model_behler(
        g2_kwargs={**cfg["g2"], "elements": elements},
        g4_kwargs={**cfg["g4"], "elements": elements, "multiplicity": 2.0},
        mlp_charge_kwargs={"units": cfg["mlp_units"], "num_relations": num_rel,
                           "activation": ["swish"] * (len(cfg["mlp_units"]) - 1) + ["linear"]},
        mlp_local_kwargs={"units": cfg["mlp_units"], "num_relations": num_rel,
                          "activation": ["swish"] * (len(cfg["mlp_units"]) - 1) + ["linear"]})
    return EnergyForceModel(model, use_esp_coupling=True)


def load_dataset(cfg):
    from gcnn_keras_tpu.data.dataset import MemoryGraphDataset
    if cfg["data_path"]:
        ds = MemoryGraphDataset().load(cfg["data_path"])
    else:
        from gcnn_keras_tpu.data.datasets.synthetic import SyntheticMDDataset
        ds = SyntheticMDDataset(num_frames=cfg["synthetic_frames"],
                                seed=cfg["seed"])
        rs = np.random.RandomState(cfg["seed"])
        for g in ds:
            n = len(g["node_number"])
            g["node_number"] = np.asarray(
                [z if z in cfg["elements"] else cfg["elements"][0]
                 for z in g["node_number"]], dtype=np.int64)
            g["charge"] = (rs.randn(n) * 0.1).astype(np.float32)
            g["esp"] = (rs.randn(n) * 0.01).astype(np.float32)
            g["esp_grad"] = (rs.randn(n, 3) * 0.01).astype(np.float32)
            g["total_charge"] = np.array([g["charge"].sum()], dtype=np.float32)
        ds.map_list("set_range", max_distance=6.0, max_neighbours=15)
        ds.map_list("set_angle")
        for g in ds:
            g["edge_indices"] = g["range_indices"]
    return ds


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--conf", default=None, help="JSON config override")
    ap.add_argument("--epochs", type=int, default=None)
    args = ap.parse_args()

    cfg = dict(CONFIG)
    if args.conf:
        with open(args.conf) as f:
            cfg.update(json.load(f))
    if args.epochs is not None:
        cfg["epochs"] = args.epochs

    import jax
    from gcnn_keras_tpu.utils.devices import honor_platform_env
    honor_platform_env()
    import optax
    from gcnn_keras_tpu.data.scalers import EnergyForceExtensiveLabelScaler
    from gcnn_keras_tpu.data.loader import GraphBatchLoader
    from gcnn_keras_tpu.training.losses import masked_graph_mae, masked_node_mae
    from gcnn_keras_tpu.training.history import save_history_score
    from gcnn_keras_tpu.utils.data_splitter import kfold_swapped_val
    from gcnn_keras_tpu.utils.checkpoint import save_checkpoint

    ds = load_dataset(cfg)
    # normalized loss weights (reference force_hdnnp4th.py:228-245)
    wsum = cfg["charge_loss_weight"] + cfg["energy_loss_weight"] + cfg["force_loss_weight"]
    wq = cfg["charge_loss_weight"] / wsum
    we = cfg["energy_loss_weight"] / wsum
    wf = cfg["force_loss_weight"] / wsum

    histories, times = [], []
    for fold, (tr, va, te) in enumerate(
            kfold_swapped_val(len(ds), k=cfg["ensemble_size"], seed=cfg["seed"])):
        train, val, test = ds[tr], ds[va], ds[te]
        scaler = EnergyForceExtensiveLabelScaler()
        scaler.fit_dataset(train)
        for split in (train, val, test):
            scaler.transform_dataset(split)

        fmodel = build_model(cfg)
        hint = train.batch_shape_hint(cfg["batch_size"])
        loader = GraphBatchLoader(list(train), cfg["batch_size"], shuffle=True,
                                  seed=cfg["seed"] + fold,
                                  global_keys=("energy", "total_charge"), **hint)
        first = next(iter(loader))
        params = fmodel.init(jax.random.PRNGKey(cfg["seed"] + fold), first,
                             train=False)
        steps = cfg["epochs"] * max(len(loader), 1)
        lr = optax.linear_schedule(cfg["learning_rate_start"],
                                   cfg["learning_rate_stop"], steps)
        optimizer = optax.adam(lr)

        def loss_fn(p, b):
            out = fmodel.apply(p, b, train=False)
            lq = masked_node_mae(out["charge"], b.nodes["charge"], b.node_mask)
            le = masked_graph_mae(out["energy"], b.globals["energy"],
                                  b.globals["graph_mask"])
            lf = masked_node_mae(out["force"], b.nodes["force"], b.node_mask)
            return wq * lq + we * le + wf * lf, \
                {"charge_mae": lq, "energy_mae": le, "force_mae": lf}

        from gcnn_keras_tpu.training.trainer import Trainer
        from gcnn_keras_tpu.training.fit import fit_model
        trainer = Trainer(loss_fn, optimizer)
        state = trainer.init_state(params)

        val_batch = val.to_batch(global_keys=("energy", "total_charge"))

        def eval_fn(p):
            vout = fmodel.apply(p, val_batch, train=False)
            lq = float(masked_node_mae(vout["charge"],
                                       val_batch.nodes["charge"],
                                       val_batch.node_mask))
            le = float(masked_graph_mae(vout["energy"],
                                        val_batch.globals["energy"],
                                        val_batch.globals["graph_mask"]))
            lf = float(masked_node_mae(vout["force"],
                                       val_batch.nodes["force"],
                                       val_batch.node_mask))
            return {"val_loss": wq * lq + we * le + wf * lf,
                    "val_charge_mae": lq, "val_energy_mae": le,
                    "val_force_mae": lf}

        if cfg["use_wandb"]:
            from gcnn_keras_tpu.utils.wandb_wizard import (init_wandb,
                                                           finish_wandb)
            init_wandb(cfg["wandb_project"], name=f"hdnnp4th_fold{fold}",
                       config=cfg)
        t0 = time.process_time()
        state, hist = fit_model(
            trainer, state, loader, eval_fn, cfg["epochs"],
            steps_per_dispatch=cfg.get("steps_per_dispatch", 1),
            early_stopping=cfg.get("early_stopping", 0), fold=fold)
        times.append(time.process_time() - t0)
        if cfg["use_wandb"]:
            finish_wandb()
        if "loss" not in hist:
            raise RuntimeError(
                "epoch produced no training steps — the loader must yield "
                "at least one batch per epoch (raise synthetic_frames / "
                "lower batch_size)")
        params, opt_state = state.params, state.opt_state
        histories.append(hist)

        outdir = f"{cfg['model_prefix']}_{fold}"
        save_checkpoint(outdir, params, opt_state=opt_state, step=cfg["epochs"])
        scaler.save(os.path.join(outdir, "scaler.json"))
        print(f"fold {fold}: loss={hist['loss'][-1]:.4f} "
              f"val_F_mae={hist['val_force_mae'][-1]:.4f} -> {outdir}")

        # Per-stage evaluation artifacts (reference force_hdnnp4th.py
        # evaluate_model): errors.json with Train/Val/Test RMSE/MAE/R2 for
        # charge/energy/force, test-set extxyz with ref+pred columns,
        # flat prediction CSVs, predict-vs-true PNGs — all in the fold dir.
        from gcnn_keras_tpu.training.evaluation import evaluate_model
        from gcnn_keras_tpu.data.dataset import MemoryGraphDataset
        eval_ds = MemoryGraphDataset(
            graphs=list(train) + list(val) + list(test))
        evaluate_model(eval_ds, fmodel, params,
                       (np.arange(len(train)),
                        len(train) + np.arange(len(val)),
                        len(train) + len(val) + np.arange(len(test))),
                       scaler=scaler, output_dir=outdir,
                       dataset_name="force", model_name="HDNNP4th",
                       make_plots=cfg["make_plots"])

    if cfg["make_plots"]:
        from gcnn_keras_tpu.utils.plots import plot_train_test_loss
        plot_train_test_loss(histories, loss_name="loss",
                             val_loss_name="val_loss",
                             model_name="HDNNP4th", dataset_name="force",
                             filepath="results", file_name="hdnnp4th_loss.png")
    score = save_history_score(histories, "results/hdnnp4th_score.yaml",
                               model_name="HDNNP4th", dataset_name="force",
                               seed=cfg["seed"], time_list=times)
    print(json.dumps({"val_force_mae_mean": score.get("val_force_mae_mean")}))


if __name__ == "__main__":
    main()
