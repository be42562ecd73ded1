"""Energy+force training driver (parity: reference
``training/train_force.py`` + fork ``force_schnet.py``/``force_painn.py``):
dataset -> extensive scaler -> EnergyForceModel -> jitted train loop ->
scores. Offline default: SyntheticMDDataset.
"""
from __future__ import annotations

import argparse
import json
import time

import numpy as np

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hyper", default=None)
    ap.add_argument("--model", default="Schnet")
    ap.add_argument("--epochs", type=int, default=50)
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--frames", type=int, default=128)
    ap.add_argument("--energy-weight", type=float, default=1.0)
    ap.add_argument("--force-weight", type=float, default=50.0)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--folds", type=int, default=1,
                    help="k-fold cross-validation like the reference's "
                         "5-fold protocol; score rows then carry real +-")
    ap.add_argument("--checkpoint-dir", default=None)
    ap.add_argument("--steps-per-dispatch", type=int, default=1,
                    help="fuse K optimizer steps into one jitted lax.scan "
                         "dispatch (recovers 0.5-3.5 ms launch latency per "
                         "step on a tunneled chip; K batches must share "
                         "bucketed shapes to fuse)")
    ap.add_argument("--n-devices", type=int, default=None,
                    help="data-parallel over the first N devices "
                         "(shard_map mesh); default single-device")
    ap.add_argument("--distributed", action="store_true",
                    help="join a multi-host jax.distributed runtime "
                         "(coordinates from JAX_COORDINATOR_ADDRESS etc.) "
                         "with per-host data sharding")
    ap.add_argument("--early-stopping", type=int, default=0,
                    help="EarlyStopping patience in epochs (0 = off); best "
                         "weights restored on stop, keras parity "
                         "(reference force_hdnnp4th.py:284-291)")
    ap.add_argument("--use-wandb", action="store_true",
                    help="log per-epoch metrics to wandb (no-op if the "
                         "wandb package is unavailable)")
    ap.add_argument("--plots", dest="plots", action="store_true", default=True)
    ap.add_argument("--no-plots", dest="plots", action="store_false",
                    help="skip predict-vs-true + loss-curve PNGs "
                         "(reference training/train_force.py post-fit block)")
    args = ap.parse_args()

    import jax
    from gcnn_keras_tpu.utils.devices import honor_platform_env
    honor_platform_env()
    import optax
    from gcnn_keras_tpu.data.scalers import EnergyForceExtensiveLabelScaler
    from gcnn_keras_tpu.data.loader import GraphBatchLoader
    from gcnn_keras_tpu.model.force import EnergyForceModel
    from gcnn_keras_tpu.models.registry import get_model_class
    from gcnn_keras_tpu.training.losses import masked_graph_mae, masked_node_mae
    from gcnn_keras_tpu.training.history import save_history_score

    if args.hyper:
        from gcnn_keras_tpu.training.hyper import HyperParameter
        from gcnn_keras_tpu.data.serial import deserialize
        hyper = HyperParameter(args.hyper, model_name=args.model)
        ds = deserialize(hyper["data"]["dataset"])
        energy_model = hyper.make_model()
        optimizer = hyper.make_optimizer()
    else:
        from gcnn_keras_tpu.data.datasets.synthetic import SyntheticMDDataset
        ds = SyntheticMDDataset(num_frames=args.frames, seed=args.seed)
        builder = get_model_class(args.model)
        if args.model == "Schnet":
            energy_model = builder(depth=3, interaction_args={"units": 64},
                                   gauss_args={"bins": 20, "distance_max": 5.0},
                                   last_mlp={"units": [64, 32],
                                             "activation": ["shifted_softplus"] * 2},
                                   output_mlp={"units": [16, 1],
                                               "activation": ["shifted_softplus", "linear"]})
        elif args.model == "PAiNN":
            energy_model = builder(depth=2, conv_args={"units": 64},
                                   update_args={"units": 64},
                                   input_embedding={"node": {"output_dim": 64}},
                                   output_mlp={"units": [64, 1],
                                               "activation": ["swish", "linear"]})
        else:
            energy_model = builder()
        total_steps = args.epochs * max(args.frames // args.batch_size, 1)
        warmup = min(50, max(total_steps // 10, 1))
        optimizer = optax.adam(optax.warmup_cosine_decay_schedule(
            0.0, 1e-3, warmup, max(total_steps, warmup + 1)))

    # preprocessing: neighbor lists
    extra_batch_kwargs = {}
    if args.model == "MXMNet":
        # MXMNet multiplex graphs (reference hyper_md17_revised.py MXMNet
        # methods): short-cutoff LOCAL bond graph -> edge_indices, wider
        # GLOBAL range graph -> range_indices (second edge set), plus the
        # two angle-pair lists over the local edges.
        ds.map_list("set_range", max_distance=2.0, max_neighbours=12)
        for g in ds:
            g["edge_indices"] = g.pop("range_indices")
        ds.map_list("set_range", max_distance=4.0, max_neighbours=25)
        ds.map_list("set_angle_pairs_kgcnn", range_indices="edge_indices",
                    edge_pairing="jk", out_key="angle_indices_1")
        ds.map_list("set_angle_pairs_kgcnn", range_indices="edge_indices",
                    edge_pairing="ik", allow_self_edges=True,
                    out_key="angle_indices_2")
        extra_batch_kwargs = dict(angle_edge_index_key="angle_indices_1",
                                  angle_edge_index_key_2="angle_indices_2",
                                  second_edge_index_key="range_indices")
    else:
        ds.map_list("set_range", max_distance=4.0, max_neighbours=15)
        for g in ds:
            g["edge_indices"] = g["range_indices"]

    # k-fold split + scaler (fit on train only), reference 5-fold protocol
    rs = np.random.RandomState(args.seed)
    idx = rs.permutation(len(ds))
    k = max(args.folds, 1)
    fold_size = max(len(ds) // max(k, 5), 1)
    folds = [(idx[f * fold_size:(f + 1) * fold_size],
              np.concatenate([idx[:f * fold_size], idx[(f + 1) * fold_size:]]))
             for f in range(k)]

    # Multi-host runtime + mesh (no-ops in single-process / single-device
    # runs, so every invocation goes through the same Trainer path)
    if args.distributed:
        from gcnn_keras_tpu.parallel.distributed import (
            maybe_initialize_distributed, host_shard_indices)
        maybe_initialize_distributed()
    mesh = None
    if args.n_devices and args.n_devices > 1:
        from gcnn_keras_tpu.parallel.mesh import make_mesh
        mesh = make_mesh(args.n_devices)

    histories, times = [], []
    for fold, (test_idx, train_idx) in enumerate(folds):
        hist, elapsed, params, state, scaler = _run_fold(
            args, ds, train_idx, test_idx, energy_model, optimizer, mesh,
            extra_batch_kwargs, fold)
        histories.append(hist)
        times.append(elapsed)

    if args.checkpoint_dir:
        from gcnn_keras_tpu.utils.checkpoint import save_checkpoint
        save_checkpoint(args.checkpoint_dir, params, opt_state=state.opt_state,
                        step=args.epochs)
        scaler.save(f"{args.checkpoint_dir}/scaler.json")

    if args.plots:
        from gcnn_keras_tpu.utils.plots import plot_train_test_loss
        plot_train_test_loss(histories, loss_name="loss",
                             val_loss_name="val_loss", model_name=args.model,
                             dataset_name="SyntheticMD",
                             filepath="results/force",
                             file_name=f"{args.model}_loss.png")
    scale = float(scaler.scale_[0])
    score = save_history_score(
        histories, f"results/force/{args.model}_score.yaml",
        model_name=args.model, dataset_name="SyntheticMD",
        seed=args.seed, time_list=times)
    vf = [h["val_force_mae"][-1] * scale for h in histories]
    ve = [h["val_energy_mae"][-1] * scale for h in histories]
    print(json.dumps({
        "val_force_mae_scaled": float(np.mean(vf)),
        "val_force_mae_scaled_std": float(np.std(vf)),
        "val_energy_mae_scaled": float(np.mean(ve)),
        "val_energy_mae_scaled_std": float(np.std(ve)),
        "folds": k, "time_s": float(np.sum(times))}))


def _run_fold(args, ds, train_idx, test_idx, energy_model, optimizer, mesh,
              extra_batch_kwargs, fold):
    import jax
    import time
    from gcnn_keras_tpu.data.scalers import EnergyForceExtensiveLabelScaler
    from gcnn_keras_tpu.data.loader import GraphBatchLoader
    from gcnn_keras_tpu.model.force import EnergyForceModel
    from gcnn_keras_tpu.training.losses import masked_graph_mae, masked_node_mae

    train, test = ds[train_idx], ds[test_idx]
    if args.distributed:
        from gcnn_keras_tpu.parallel.distributed import host_shard_indices
        train = train[host_shard_indices(len(train), seed=args.seed)]
    scaler = EnergyForceExtensiveLabelScaler()
    scaler.fit_dataset(train)
    scaler.transform_dataset(train)
    scaler.transform_dataset(test)

    hint = train.batch_shape_hint(args.batch_size)
    loader = GraphBatchLoader(list(train), args.batch_size, shuffle=True,
                              seed=args.seed + fold, global_keys=("energy",),
                              **hint, **extra_batch_kwargs)
    fmodel = EnergyForceModel(energy_model)
    first = next(iter(loader))
    params = fmodel.init(jax.random.PRNGKey(args.seed + fold), first)

    def loss_fn(p, b):
        out = fmodel.apply(p, b)
        e_loss = masked_graph_mae(out["energy"], b.globals["energy"],
                                  b.globals["graph_mask"])
        f_loss = masked_node_mae(out["force"], b.nodes["force"], b.node_mask)
        return args.energy_weight * e_loss + args.force_weight * f_loss, \
            {"energy_mae": e_loss, "force_mae": f_loss}

    from gcnn_keras_tpu.training.trainer import Trainer
    from gcnn_keras_tpu.training.fit import fit_model
    trainer = Trainer(loss_fn, optimizer, mesh=mesh)
    state = trainer.init_state(params)

    def epoch_batches():
        if mesh is None:
            return loader
        from gcnn_keras_tpu.parallel.data_parallel import dp_batch_iterator
        return dp_batch_iterator(loader, mesh)

    test_batch = test.to_batch(global_keys=("energy",),
                               **extra_batch_kwargs)

    def eval_fn(p):
        out = fmodel.apply(p, test_batch)
        ve = float(masked_graph_mae(out["energy"], test_batch.globals["energy"],
                                    test_batch.globals["graph_mask"]))
        vf = float(masked_node_mae(out["force"], test_batch.nodes["force"],
                                   test_batch.node_mask))
        return {"val_loss": args.energy_weight * ve + args.force_weight * vf,
                "val_energy_mae": ve, "val_force_mae": vf}

    if args.use_wandb:
        from gcnn_keras_tpu.utils.wandb_wizard import init_wandb
        init_wandb("gcnn_keras_tpu", name=f"{args.model}_fold{fold}",
                   config=vars(args))
    t0 = time.perf_counter()
    state, hist = fit_model(trainer, state, epoch_batches, eval_fn,
                            args.epochs,
                            steps_per_dispatch=args.steps_per_dispatch,
                            early_stopping=args.early_stopping, fold=fold)
    elapsed = time.perf_counter() - t0
    if args.use_wandb:
        from gcnn_keras_tpu.utils.wandb_wizard import finish_wandb
        finish_wandb()
    if "loss" not in hist:
        raise RuntimeError(
            "epoch produced no training steps — with --n-devices the "
            "loader must yield at least n_devices same-shape batches "
            "per epoch (raise --frames or lower --batch-size)")
    params = state.params

    if args.plots:
        # per-fold predict-vs-true on the held-out fold (reference
        # training/train_force.py:224-231) + per-fold loss curve
        from gcnn_keras_tpu.utils.plots import plot_predict_true
        out = fmodel.apply(params, test_batch)
        gm = np.asarray(test_batch.globals["graph_mask"], bool).reshape(-1)
        nm = np.asarray(test_batch.node_mask, bool)
        pdir = f"results/force/{args.model}_fold{fold}"
        plot_predict_true(
            np.asarray(out["energy"]).reshape(-1)[gm],
            np.asarray(test_batch.globals["energy"]).reshape(-1)[gm],
            model_name=args.model, dataset_name="SyntheticMD",
            target_names="energy", filepath=pdir,
            file_name="predict_energy.png")
        plot_predict_true(
            np.asarray(out["force"])[nm],
            np.asarray(test_batch.nodes["force"])[nm],
            model_name=args.model, dataset_name="SyntheticMD",
            target_names="force", filepath=pdir,
            file_name="predict_force.png")
    return hist, elapsed, params, state, scaler


if __name__ == "__main__":
    main()
