"""Shared engine for the fork-style force/energy/charge training scripts
(reference repo-root ``force_*.py`` / ``energy_*.py`` / ``charge_*.py`` all
repeat the same scaffold; here it is factored once).

run_force_training(build_energy_model, cfg) implements:
dataset load (pickle or synthetic) -> ensemble k-fold with swapped val
(force_hdnnp4th.py:366) -> extensive scaler -> weighted multi-output loss ->
jitted Adam loop with linear LR decay -> checkpoints + score file.
"""
from __future__ import annotations

import json
import os
import time
from typing import Callable, Dict, Optional

import numpy as np

DEFAULTS = {
    "data_path": None,
    "model_prefix": "model_energy_force",
    "charge_loss_weight": 0.0,
    "energy_loss_weight": 1.0,
    "force_loss_weight": 200.0,
    "epochs": 100,
    "batch_size": 16,
    "learning_rate_start": 1e-3,
    "learning_rate_stop": 1e-5,
    "ensemble_size": 3,
    "seed": 42,
    "cutoff": 6.0,
    "max_neighbours": 15,
    "need_angles": False,
    "need_esp": False,
    "synthetic_frames": 64,
    "use_esp_coupling": False,
    "outputs": ("energy", "force"),
    # data parallelism over the first N devices (shard_map mesh); 0/None =
    # single device. "distributed" joins a multi-host jax.distributed
    # runtime and shards the dataset per host.
    "n_devices": 0,
    "distributed": False,
    # fuse K optimizer steps per jitted dispatch (PERF.md r3, 2.65x)
    "steps_per_dispatch": 1,
    # reference force_hdnnp4th.py:284-295 training conveniences:
    # EarlyStopping patience (0 = off; restore_best_weights on stop),
    # optional wandb run, per-fold predict-vs-true + loss-curve PNGs
    "early_stopping": 0,
    "use_wandb": False,
    "wandb_project": "gcnn_keras_tpu",
    "make_plots": True,
}


def script_config(mod, **overrides) -> Dict:
    """Engine DEFAULTS merged UNDER a fork script module's CONFIG (the rule
    every config consumer must follow — charge_/energy_* scripts' CONFIGs
    lack engine keys like "cutoff" and KeyError without it; pinned by
    tests/test_force_script.py for load_model, evaluate_models,
    calc_prediction_std and transfer_learning)."""
    cfg = dict(DEFAULTS)
    cfg.update(mod.CONFIG)
    cfg.update({k: v for k, v in overrides.items() if v is not None})
    return cfg


def normalized_loss_weights(cfg: Dict) -> Dict[str, float]:
    """Charge/energy/force loss weights normalized over ALL three configured
    weights (reference ``force_hdnnp4th.py:228-245``). Factored out so the
    normalization is testable on its own: an earlier version summed only the
    energy/force weights, so charge-only scripts divided by ~0 and trained
    with a ~1e9 charge weight (pinned by tests/test_force_script.py)."""
    w = {"charge": cfg["charge_loss_weight"],
         "energy": cfg["energy_loss_weight"],
         "force": cfg["force_loss_weight"]}
    wsum = sum(w.values())
    return {k: v / max(wsum, 1e-9) for k, v in w.items()}


def load_force_dataset(cfg: Dict):
    from ..data.dataset import MemoryGraphDataset
    if cfg.get("data_path"):
        ds = MemoryGraphDataset().load(cfg["data_path"])
        if "range_indices" not in ds[0]:
            ds.map_list("set_range", max_distance=cfg["cutoff"],
                        max_neighbours=cfg["max_neighbours"])
            if cfg["need_angles"]:
                ds.map_list("set_angle")
        for g in ds:
            g.setdefault("edge_indices", g.get("range_indices"))
        return ds
    from ..data.datasets.synthetic import SyntheticMDDataset
    ds = SyntheticMDDataset(num_frames=cfg["synthetic_frames"], seed=cfg["seed"])
    rs = np.random.RandomState(cfg["seed"])
    for g in ds:
        n = len(g["node_number"])
        if cfg["need_esp"]:
            g["charge"] = (rs.randn(n) * 0.1).astype(np.float32)
            g["esp"] = (rs.randn(n) * 0.01).astype(np.float32)
            g["esp_grad"] = (rs.randn(n, 3) * 0.01).astype(np.float32)
            g["total_charge"] = np.array([g["charge"].sum()], dtype=np.float32)
    ds.map_list("set_range", max_distance=cfg["cutoff"],
                max_neighbours=cfg["max_neighbours"])
    if cfg["need_angles"]:
        ds.map_list("set_angle")
    for g in ds:
        g["edge_indices"] = g["range_indices"]
    return ds


def run_force_training(build_model: Callable[[Dict], object], cfg: Dict) -> Dict:
    """build_model(cfg) -> EnergyForceModel-like with init/apply."""
    import jax
    from ..utils.devices import honor_platform_env
    honor_platform_env()
    import optax
    from ..data.scalers import EnergyForceExtensiveLabelScaler
    from ..data.loader import GraphBatchLoader
    from .losses import masked_graph_mae, masked_node_mae
    from .history import save_history_score
    from ..utils.data_splitter import kfold_swapped_val
    from ..utils.checkpoint import save_checkpoint

    merged = dict(DEFAULTS)
    merged.update(cfg)
    cfg = merged
    ds = load_force_dataset(cfg)

    if cfg["distributed"]:
        from ..parallel.distributed import (maybe_initialize_distributed,
                                            host_shard_indices)
        maybe_initialize_distributed()
        ds = ds[host_shard_indices(len(ds), seed=cfg["seed"])]
    mesh = None
    if cfg["n_devices"] and cfg["n_devices"] > 1:
        from ..parallel.mesh import make_mesh
        mesh = make_mesh(cfg["n_devices"])

    w = normalized_loss_weights(cfg)

    global_keys = ["energy"]
    if cfg["need_esp"]:
        global_keys.append("total_charge")

    histories, times = [], []
    for fold, (tr, va, te) in enumerate(
            kfold_swapped_val(len(ds), k=cfg["ensemble_size"], seed=cfg["seed"])):
        train, val = ds[tr], ds[va]
        scaler = EnergyForceExtensiveLabelScaler()
        scaler.fit_dataset(train)
        scaler.transform_dataset(train)
        scaler.transform_dataset(val)

        fmodel = build_model(cfg)
        hint = train.batch_shape_hint(cfg["batch_size"])
        loader = GraphBatchLoader(list(train), cfg["batch_size"], shuffle=True,
                                  seed=cfg["seed"] + fold,
                                  global_keys=tuple(global_keys), **hint)
        first = next(iter(loader))
        params = fmodel.init(jax.random.PRNGKey(cfg["seed"] + fold), first,
                             train=False)
        steps = cfg["epochs"] * max(len(loader), 1)
        lr = optax.linear_schedule(cfg["learning_rate_start"],
                                   cfg["learning_rate_stop"], steps)
        optimizer = optax.adam(lr)

        def loss_fn(p, b):
            out = fmodel.apply(p, b, train=False)
            metrics = {}
            loss = 0.0
            if w["energy"] > 0:
                le = masked_graph_mae(out["energy"], b.globals["energy"],
                                      b.globals["graph_mask"])
                loss += w["energy"] * le
                metrics["energy_mae"] = le
            if w["force"] > 0 and "force" in out:
                lf = masked_node_mae(out["force"], b.nodes["force"], b.node_mask)
                loss += w["force"] * lf
                metrics["force_mae"] = lf
            if w["charge"] > 0 and "charge" in out and "charge" in b.nodes:
                lq = masked_node_mae(out["charge"], b.nodes["charge"], b.node_mask)
                loss += w["charge"] * lq
                metrics["charge_mae"] = lq
            return loss, metrics

        from .trainer import Trainer
        from .fit import fit_model
        trainer = Trainer(loss_fn, optimizer, mesh=mesh)
        state = trainer.init_state(params)

        def epoch_batches():
            if mesh is None:
                return loader
            from ..parallel.data_parallel import dp_batch_iterator
            return dp_batch_iterator(loader, mesh)

        val_batch = val.to_batch(global_keys=tuple(global_keys))

        def eval_fn(p):
            vout = fmodel.apply(p, val_batch, train=False)
            out = {}
            vloss = 0.0
            le = float(masked_graph_mae(vout["energy"],
                                        val_batch.globals["energy"],
                                        val_batch.globals["graph_mask"]))
            out["val_energy_mae"] = le
            vloss += w["energy"] * le
            if "force" in vout and w["force"] > 0:
                lf = float(masked_node_mae(vout["force"],
                                           val_batch.nodes["force"],
                                           val_batch.node_mask))
                out["val_force_mae"] = lf
                vloss += w["force"] * lf
            if w["charge"] > 0 and "charge" in vout \
                    and "charge" in val_batch.nodes:
                lq = float(masked_node_mae(vout["charge"],
                                           val_batch.nodes["charge"],
                                           val_batch.node_mask))
                out["val_charge_mae"] = lq
                vloss += w["charge"] * lq
            out["val_loss"] = vloss
            return out

        if cfg["use_wandb"]:
            from ..utils.wandb_wizard import init_wandb
            init_wandb(cfg["wandb_project"],
                       name=f"{cfg['model_prefix']}_fold{fold}", config=cfg)
        t0 = time.process_time()
        print(f"fold {fold}: compiling + training {cfg['epochs']} epochs...",
              flush=True)
        state, hist = fit_model(
            trainer, state, epoch_batches, eval_fn, cfg["epochs"],
            steps_per_dispatch=cfg.get("steps_per_dispatch", 1),
            early_stopping=cfg.get("early_stopping", 0), fold=fold)
        times.append(time.process_time() - t0)
        if cfg["use_wandb"]:
            from ..utils.wandb_wizard import finish_wandb
            finish_wandb()
        if "loss" not in hist:
            raise RuntimeError(
                "epoch produced no training steps — with n_devices > 1 the "
                "loader must yield at least n_devices same-shape batches "
                "per epoch (raise synthetic_frames / lower batch_size)")
        params, opt_state = state.params, state.opt_state
        histories.append(hist)
        outdir = f"{cfg['model_prefix']}_{fold}"
        save_checkpoint(outdir, params, opt_state=opt_state, step=cfg["epochs"])
        scaler.save(os.path.join(outdir, "scaler.json"))
        print(f"fold {fold}: loss={hist['loss'][-1]:.4f} -> {outdir}")

        # per-fold test-split artifacts in RAW units through the shared
        # evaluator (errors.json + extxyz + CSVs + predict PNGs — the
        # reference's post-fit evaluate_model block)
        from .evaluation import evaluate_model
        from ..data.dataset import MemoryGraphDataset
        test = ds[te]
        scaler.transform_dataset(test)
        eval_ds = MemoryGraphDataset(graphs=list(test))
        evaluate_model(eval_ds, fmodel, params,
                       (np.array([], np.int64), np.array([], np.int64),
                        np.arange(len(test))),
                       scaler=scaler, output_dir=outdir,
                       dataset_name="force", model_name=cfg["model_prefix"],
                       global_keys=tuple(global_keys),
                       make_plots=cfg["make_plots"])

    if cfg["make_plots"]:
        from ..utils.plots import plot_train_test_loss
        plot_train_test_loss(histories, loss_name="loss",
                             val_loss_name="val_loss",
                             model_name=cfg["model_prefix"],
                             dataset_name="force", filepath="results",
                             file_name=f"{cfg['model_prefix']}_loss.png")
    score = save_history_score(
        histories, f"results/{cfg['model_prefix']}_score.yaml",
        model_name=cfg["model_prefix"], dataset_name=cfg.get("data_path") or "synthetic",
        seed=cfg["seed"], time_list=times)
    return score


def parse_config_cli(defaults: Dict) -> Dict:
    """--conf JSON override + --epochs, like the reference scripts
    (force_hdnnp4th.py:35-123)."""
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--conf", default=None)
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--data-path", default=None)
    ap.add_argument("--n-devices", type=int, default=None,
                    help="data-parallel over the first N devices")
    ap.add_argument("--distributed", action="store_true",
                    help="join a multi-host jax.distributed runtime")
    args = ap.parse_args()
    cfg = dict(defaults)
    if args.conf:
        with open(args.conf) as f:
            cfg.update(json.load(f))
    if args.epochs is not None:
        cfg["epochs"] = args.epochs
    if args.data_path:
        cfg["data_path"] = args.data_path
    if args.n_devices is not None:
        cfg["n_devices"] = args.n_devices
    if args.distributed:
        cfg["distributed"] = True
    return cfg
