"""Node-classification training driver (parity: reference
``training/train_citation.py``): GCN & friends on citation graphs with
semi-supervised masking and k-fold over node splits.

Offline default uses SyntheticCitationDataset; pass a hyper config with
CoraDataset/CoraLuDataset when data is available.
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
    ap.add_argument("--hyper", default=None, help="path to hyper config")
    ap.add_argument("--model", default="GCN")
    ap.add_argument("--epochs", type=int, default=100)
    ap.add_argument("--folds", type=int, default=5)
    ap.add_argument("--nodes", type=int, default=500)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--early-stopping", type=int, default=0,
                    help="EarlyStopping patience on val accuracy (0 = off); "
                         "restores best weights on stop (keras parity)")
    ap.add_argument("--plots", dest="plots", action="store_true", default=True)
    ap.add_argument("--no-plots", dest="plots", action="store_false")
    args = ap.parse_args()

    import jax
    from gcnn_keras_tpu.utils.devices import honor_platform_env
    honor_platform_env()
    import jax.numpy as jnp
    import optax
    from gcnn_keras_tpu.batch import batch_graphs
    from gcnn_keras_tpu.training.losses import (
        masked_categorical_crossentropy, masked_accuracy)
    from gcnn_keras_tpu.training.history import save_history_score
    from gcnn_keras_tpu.models.registry import get_model_class

    if args.hyper:
        from gcnn_keras_tpu.training.hyper import HyperParameter
        from gcnn_keras_tpu.data.serial import deserialize
        hyper = HyperParameter(args.hyper, model_name=args.model)
        ds = deserialize(hyper["data"]["dataset"])
        model = hyper.make_model()
        optimizer = hyper.make_optimizer()
    else:
        from gcnn_keras_tpu.data.datasets.synthetic import SyntheticCitationDataset
        ds = SyntheticCitationDataset(num_nodes=args.nodes, seed=args.seed)
        num_classes = int(np.asarray(ds[0]["node_labels"]).max()) + 1
        model = get_model_class(args.model)(
            depth=3, gcn_args={"units": 64},
            output_embedding="node",
            output_mlp={"units": [64, num_classes],
                        "activation": ["relu", "linear"]})
        optimizer = optax.adam(1e-2)

    g = dict(ds[0])
    labels = np.asarray(g.pop("node_labels"))
    batch = batch_graphs([g])
    n = labels.shape[0]
    y = np.zeros(batch.n_node, dtype=np.int64)
    y[:n] = labels
    y = jnp.asarray(y)

    rs = np.random.RandomState(args.seed)
    perm = rs.permutation(n)
    folds = np.array_split(perm, args.folds)
    histories, times = [], []

    for fold_i, test_idx in enumerate(folds):
        train_mask = np.zeros(batch.n_node, dtype=bool)
        train_mask[:n] = True
        train_mask[test_idx] = False
        test_mask = np.zeros(batch.n_node, dtype=bool)
        test_mask[test_idx] = True
        train_mask_j = jnp.asarray(train_mask)
        test_mask_j = jnp.asarray(test_mask)

        params = model.init(jax.random.PRNGKey(fold_i), batch)
        opt_state = optimizer.init(params)

        def loss_fn(p, mask):
            out = model.apply(p, batch)["output"]
            return masked_categorical_crossentropy(out, y, mask), out

        @jax.jit
        def step(p, s):
            (l, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(p, train_mask_j)
            updates, s = optimizer.update(grads, s, p)
            return optax.apply_updates(p, updates), s, l, out

        from gcnn_keras_tpu.training.callbacks import EarlyStopping
        stopper = EarlyStopping(monitor="val_categorical_accuracy",
                                patience=args.early_stopping, mode="max") \
            if args.early_stopping > 0 else None
        t0 = time.perf_counter()
        hist = {"loss": [], "val_categorical_accuracy": []}
        for epoch in range(args.epochs):
            params, opt_state, loss, out = step(params, opt_state)
            if stopper is not None or epoch % 10 == 9 \
                    or epoch == args.epochs - 1:
                acc = float(masked_accuracy(out, y, test_mask_j))
                hist["loss"].append(float(loss))
                hist["val_categorical_accuracy"].append(acc)
                if stopper is not None and stopper.update(
                        epoch, {"val_categorical_accuracy": acc}, params):
                    params = jax.tree.map(jnp.asarray,
                                          stopper.restore(params))
                    print(f"fold {fold_i}: early stopping at epoch {epoch}")
                    break
        times.append(time.perf_counter() - t0)
        histories.append(hist)
        print(f"fold {fold_i}: loss={hist['loss'][-1]:.4f} "
              f"val_acc={hist['val_categorical_accuracy'][-1]:.4f}")

    if args.plots:
        from gcnn_keras_tpu.utils.plots import plot_train_test_loss
        plot_train_test_loss(histories, loss_name="loss",
                             val_loss_name="val_categorical_accuracy",
                             model_name=args.model,
                             dataset_name="SyntheticCitation",
                             filepath="results/citation",
                             file_name=f"{args.model}_loss.png")
    score = save_history_score(
        histories, f"results/citation/{args.model}_score.yaml",
        model_name=args.model, dataset_name="SyntheticCitation",
        seed=args.seed, time_list=times)
    print(json.dumps({"val_categorical_accuracy_mean":
                      score.get("val_categorical_accuracy_mean")}))


if __name__ == "__main__":
    main()
