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
        trainer = Trainer(loss_fn, optimizer)
        state = trainer.init_state(params)

        test_batch = test.to_batch(global_keys=("graph_labels",))
        hist = {"loss": [], "val_scaled_mae": []}
        t0 = time.perf_counter()
        for epoch in range(args.epochs):
            state, em = trainer.fit_epoch(
                state, loader,
                steps_per_dispatch=getattr(args, "steps_per_dispatch", 1))
            params = state.params
            losses = [em.get("loss", float("nan"))]
            out = model.apply(params, test_batch)["output"]
            vm = float(masked_graph_mae(out, test_batch.globals["graph_labels"],
                                        test_batch.globals["graph_mask"]))
            hist["loss"].append(float(np.mean(losses)))
            hist["val_scaled_mae"].append(vm * float(scaler.get_scaling()[0]))
        times.append(time.perf_counter() - t0)
        histories.append(hist)
        print(f"fold {fold}: val_scaled_mae={hist['val_scaled_mae'][-1]:.4f}")

    score = save_history_score(histories, f"results/qm/{args.model}_score.yaml",
                               model_name=args.model, dataset_name="SyntheticQM9",
                               seed=args.seed, time_list=times)
    print(json.dumps({"val_scaled_mae_mean": score.get("val_scaled_mae_mean")}))


if __name__ == "__main__":
    main()
