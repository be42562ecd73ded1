"""QM property regression driver (parity: reference ``training/train_qm.py``):
dataset (QM9/QM7 or synthetic) -> scaler -> model -> k-fold -> scaled MAE.
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
    ap.add_argument("--epochs", type=int, default=60)
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--folds", type=int, default=3)
    ap.add_argument("--molecules", type=int, default=128)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--steps-per-dispatch", type=int, default=1,
                    help="fuse K same-shape optimizer steps into one "
                         "jitted dispatch (2.65x measured on the tunneled "
                         "chip; see PERF.md r3)")
    ap.add_argument("--early-stopping", type=int, default=0,
                    help="EarlyStopping patience (0 = off); restores best "
                         "weights on stop (keras parity)")
    ap.add_argument("--use-wandb", action="store_true")
    ap.add_argument("--plots", dest="plots", action="store_true", default=True)
    ap.add_argument("--no-plots", dest="plots", action="store_false")
    args = ap.parse_args()

    import jax
    from gcnn_keras_tpu.utils.devices import honor_platform_env
    honor_platform_env()
    import optax
    from gcnn_keras_tpu.batch import batch_graphs
    from gcnn_keras_tpu.data.loader import GraphBatchLoader
    from gcnn_keras_tpu.data.scalers import ExtensiveMolecularLabelScaler
    from gcnn_keras_tpu.models.registry import get_model_class
    from gcnn_keras_tpu.training.losses import masked_graph_mae
    from gcnn_keras_tpu.training.history import save_history_score
    from gcnn_keras_tpu.utils.data_splitter import kfold_indices

    if args.hyper:
        from gcnn_keras_tpu.training.hyper import HyperParameter
        from gcnn_keras_tpu.data.serial import deserialize
        hyper = HyperParameter(args.hyper, model_name=args.model)
        ds = deserialize(hyper["data"]["dataset"])
        make = hyper.make_model
        make_opt = hyper.make_optimizer
    else:
        from gcnn_keras_tpu.data.datasets.synthetic import SyntheticQM9Dataset
        ds = SyntheticQM9Dataset(num_molecules=args.molecules, seed=args.seed)
        ds.map_list("set_range", max_distance=4.0, max_neighbours=15)
        builder = get_model_class(args.model)

        def make():
            if args.model == "Schnet":
                return builder(depth=3, interaction_args={"units": 64},
                               gauss_args={"bins": 20, "distance_max": 4.0},
                               last_mlp={"units": [64, 32],
                                         "activation": ["shifted_softplus"] * 2},
                               output_mlp={"units": [16, 1],
                                           "activation": ["shifted_softplus", "linear"]})
            if args.model == "PAiNN":
                return builder(depth=2, conv_args={"units": 64},
                               update_args={"units": 64},
                               input_embedding={"node": {"output_dim": 64}},
                               output_mlp={"units": [64, 1],
                                           "activation": ["swish", "linear"]})
            return builder()

        def make_opt():
            return optax.adam(1e-3)

    for g in ds:
        g["edge_indices"] = g.get("range_indices", g.get("edge_indices"))

    y = np.array([float(np.asarray(g["graph_labels"]).reshape(-1)[0]) for g in ds])
    z = [np.asarray(g["node_number"]) for g in ds]

    histories, times = [], []
    for fold, (tr, te) in enumerate(kfold_indices(len(ds), k=args.folds,
                                                  seed=args.seed)):
        scaler = ExtensiveMolecularLabelScaler()
        y_tr = scaler.fit(y[tr], [z[i] for i in tr]).transform(y[tr], [z[i] for i in tr])
        y_te = scaler.transform(y[te], [z[i] for i in te])
        train = ds[tr]
        for g, yy in zip(train, y_tr):
            g["graph_labels"] = np.array([yy], dtype=np.float32)
        test = ds[te]
        for g, yy in zip(test, y_te):
            g["graph_labels"] = np.array([yy], dtype=np.float32)

        model = make()
        optimizer = make_opt()
        hint = train.batch_shape_hint(args.batch_size)
        loader = GraphBatchLoader(list(train), args.batch_size, shuffle=True,
                                  seed=args.seed, global_keys=("graph_labels",),
                                  **hint)
        first = next(iter(loader))
        params = model.init(jax.random.PRNGKey(fold), first)

        def loss_fn(p, b):
            out = model.apply(p, b)["output"]
            return masked_graph_mae(out, b.globals["graph_labels"],
                                    b.globals["graph_mask"]), {}

        from gcnn_keras_tpu.training.trainer import Trainer
        from gcnn_keras_tpu.training.fit import fit_model
        trainer = Trainer(loss_fn, optimizer)
        state = trainer.init_state(params)

        test_batch = test.to_batch(global_keys=("graph_labels",))
        scale = float(scaler.get_scaling()[0])

        def eval_fn(p):
            out = model.apply(p, test_batch)["output"]
            vm = float(masked_graph_mae(out, test_batch.globals["graph_labels"],
                                        test_batch.globals["graph_mask"]))
            return {"val_loss": vm, "val_scaled_mae": vm * scale}

        if args.use_wandb:
            from gcnn_keras_tpu.utils.wandb_wizard import init_wandb
            init_wandb("gcnn_keras_tpu", name=f"qm_{args.model}_fold{fold}",
                       config=vars(args))
        t0 = time.perf_counter()
        state, hist = fit_model(trainer, state, loader, eval_fn, args.epochs,
                                steps_per_dispatch=args.steps_per_dispatch,
                                early_stopping=args.early_stopping, fold=fold,
                                verbose_every=0)
        times.append(time.perf_counter() - t0)
        if args.use_wandb:
            from gcnn_keras_tpu.utils.wandb_wizard import finish_wandb
            finish_wandb()
        params = state.params
        histories.append(hist)
        print(f"fold {fold}: val_scaled_mae={hist['val_scaled_mae'][-1]:.4f}")

        if args.plots:
            from gcnn_keras_tpu.utils.plots import plot_predict_true
            out = model.apply(params, test_batch)["output"]
            gm = np.asarray(test_batch.globals["graph_mask"], bool).reshape(-1)
            plot_predict_true(
                np.asarray(out).reshape(-1)[gm],
                np.asarray(test_batch.globals["graph_labels"]).reshape(-1)[gm],
                model_name=args.model, dataset_name="SyntheticQM9",
                target_names="graph_labels",
                filepath=f"results/qm/{args.model}_fold{fold}",
                file_name="predict.png")

    if args.plots:
        from gcnn_keras_tpu.utils.plots import plot_train_test_loss
        plot_train_test_loss(histories, loss_name="loss",
                             val_loss_name="val_loss", model_name=args.model,
                             dataset_name="SyntheticQM9", filepath="results/qm",
                             file_name=f"{args.model}_loss.png")
    score = save_history_score(histories, f"results/qm/{args.model}_score.yaml",
                               model_name=args.model, dataset_name="SyntheticQM9",
                               seed=args.seed, time_list=times)
    print(json.dumps({"val_scaled_mae_mean": score.get("val_scaled_mae_mean")}))


if __name__ == "__main__":
    main()
