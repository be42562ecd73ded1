"""Graph classification driver on TUDataset-format data (parity: reference
``training/train_tudataset.py``)."""
from __future__ import annotations

import argparse
import json
import time

import numpy as np

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="GIN")
    ap.add_argument("--dataset", default=None,
                    help="TUDataset name (e.g. MUTAG); default synthetic")
    ap.add_argument("--epochs", type=int, default=60)
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--folds", type=int, default=3)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--steps-per-dispatch", type=int, default=1,
                    help="fuse K same-shape optimizer steps into one "
                         "jitted dispatch (see PERF.md r3)")
    ap.add_argument("--early-stopping", type=int, default=0,
                    help="EarlyStopping patience on val_accuracy (0 = off); "
                         "restores best weights on stop (keras parity)")
    ap.add_argument("--use-wandb", action="store_true")
    ap.add_argument("--plots", dest="plots", action="store_true", default=True)
    ap.add_argument("--no-plots", dest="plots", action="store_false")
    args = ap.parse_args()

    import jax
    from gcnn_keras_tpu.utils.devices import honor_platform_env
    honor_platform_env()
    import jax.numpy as jnp
    import optax
    from gcnn_keras_tpu.data.loader import GraphBatchLoader
    from gcnn_keras_tpu.models.registry import get_model_class
    from gcnn_keras_tpu.training.losses import (
        masked_categorical_crossentropy, masked_accuracy)
    from gcnn_keras_tpu.training.history import save_history_score
    from gcnn_keras_tpu.utils.data_splitter import kfold_indices

    if args.dataset:
        from gcnn_keras_tpu.data.datasets.tudataset import GraphTUDataset2020
        ds = GraphTUDataset2020(dataset_name=args.dataset)
        ds.read_in_memory()
    else:
        # synthetic binary classification: label = graph has a triangle-rich hub
        from gcnn_keras_tpu.data.datasets.synthetic import SyntheticQM9Dataset
        ds = SyntheticQM9Dataset(num_molecules=96, seed=args.seed)
        ds.map_list("set_range", max_distance=4.0, max_neighbours=10)
        for g in ds:
            g["edge_indices"] = g["range_indices"]
            g["graph_labels"] = np.array(
                [float(len(g["node_number"]) > 9)], dtype=np.float32)

    labels = np.array([int(np.asarray(g["graph_labels"]).reshape(-1)[0])
                       for g in ds])
    n_classes = int(labels.max()) + 1
    builder = get_model_class(args.model)
    histories, times = [], []
    for fold, (tr, te) in enumerate(kfold_indices(len(ds), k=args.folds,
                                                  seed=args.seed)):
        model = builder(depth=3,
                        gin_mlp={"units": [64, 64], "activation": ["relu", "linear"]},
                        last_mlp={"units": [64], "activation": ["relu"]},
                        output_mlp={"units": [n_classes], "activation": ["linear"]}) \
            if args.model == "GIN" else builder()
        optimizer = optax.adam(1e-3)
        train, test = ds[tr], ds[te]
        hint = train.batch_shape_hint(args.batch_size)
        loader = GraphBatchLoader(list(train), args.batch_size, shuffle=True,
                                  seed=args.seed, global_keys=("graph_labels",),
                                  **hint)
        first = next(iter(loader))
        params = model.init(jax.random.PRNGKey(fold), first, train=False)

        def loss_fn(p, b):
            out = model.apply(p, b, train=False)["output"]
            y = b.globals["graph_labels"].reshape(-1).astype(jnp.int32)
            return masked_categorical_crossentropy(
                out, y, b.globals["graph_mask"]), {}

        from gcnn_keras_tpu.training.trainer import Trainer
        trainer = Trainer(loss_fn, optimizer)
        state = trainer.init_state(params)

        test_batch = test.to_batch(global_keys=("graph_labels",))
        y_te = jnp.asarray(labels[te])

        def eval_fn(p):
            out = model.apply(p, test_batch, train=False)["output"]
            acc = float(masked_accuracy(
                out[:len(te)], y_te,
                test_batch.globals["graph_mask"][:len(te)]))
            # monitor maximizes accuracy -> minimize its negation
            return {"val_accuracy": acc, "val_loss": -acc}

        from gcnn_keras_tpu.training.fit import fit_model
        if args.use_wandb:
            from gcnn_keras_tpu.utils.wandb_wizard import init_wandb
            init_wandb("gcnn_keras_tpu", name=f"tu_{args.model}_fold{fold}",
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
        print(f"fold {fold}: val_acc={hist['val_accuracy'][-1]:.4f}")

    if args.plots:
        from gcnn_keras_tpu.utils.plots import plot_train_test_loss
        plot_train_test_loss(histories, loss_name="loss",
                             val_loss_name="val_accuracy",
                             model_name=args.model,
                             dataset_name=args.dataset or "synthetic",
                             filepath="results/tudataset",
                             file_name=f"{args.model}_loss.png")
    score = save_history_score(histories,
                               f"results/tudataset/{args.model}_score.yaml",
                               model_name=args.model,
                               dataset_name=args.dataset or "synthetic",
                               seed=args.seed, time_list=times)
    print(json.dumps({"val_accuracy_mean": score.get("val_accuracy_mean")}))


if __name__ == "__main__":
    main()
