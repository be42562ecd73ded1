"""Visual-graph-dataset training driver (parity: reference
``training/train_visual_graph_dataset.py``, 347 LoC): trains an explainable
model (MEGAN) on a visual-graph dataset and evaluates both prediction error
and explanation quality (node-importance AUC against the ground-truth
masks)."""
from __future__ import annotations

import argparse
import json
import time

import numpy as np

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def importance_auc(scores: np.ndarray, truth: np.ndarray) -> float:
    """ROC-AUC of continuous importance scores vs binary ground truth."""
    pos, neg = scores[truth > 0.5], scores[truth <= 0.5]
    if len(pos) == 0 or len(neg) == 0:
        return float("nan")
    # probability a random positive outranks a random negative
    order = np.argsort(np.concatenate([neg, pos]))
    ranks = np.empty_like(order, dtype=np.float64)
    ranks[order] = np.arange(1, len(order) + 1)
    r_pos = ranks[len(neg):].sum()
    return float((r_pos - len(pos) * (len(pos) + 1) / 2)
                 / (len(pos) * len(neg)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hyper", default=None)
    ap.add_argument("--model", default="MEGAN")
    ap.add_argument("--dataset", default="VgdMockDataset",
                    choices=["VgdMockDataset", "VgdRbMotifsDataset"])
    ap.add_argument("--epochs", type=int, default=100)
    ap.add_argument("--graphs", type=int, default=64)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--folds", type=int, default=1,
                    help="k-fold cross-validation (1 = single 80/20 split)")
    args = ap.parse_args()

    import jax
    from gcnn_keras_tpu.utils.devices import honor_platform_env
    honor_platform_env()
    import optax
    from gcnn_keras_tpu.batch import batch_graphs
    from gcnn_keras_tpu.training.losses import masked_graph_mae
    from gcnn_keras_tpu.training.history import save_history_score

    if args.hyper:
        from gcnn_keras_tpu.training.hyper import HyperParameter
        from gcnn_keras_tpu.data.serial import deserialize
        hyper = HyperParameter(args.hyper, model_name=args.model)
        ds = deserialize(hyper["data"]["dataset"])
        model = hyper.make_model()
        optimizer = hyper.make_optimizer()
        epochs = hyper["training"]["fit"].get("epochs", args.epochs)
    else:
        from gcnn_keras_tpu.data.datasets.vgd import (
            VgdMockDataset, VgdRbMotifsDataset)
        cls = {"VgdMockDataset": VgdMockDataset,
               "VgdRbMotifsDataset": VgdRbMotifsDataset}[args.dataset]
        ds = cls(num_graphs=args.graphs, seed=args.seed)
        from gcnn_keras_tpu.models.megan import make_model
        model = make_model(units=[32, 32], importance_channels=2,
                           final_units=[16, 1], final_activation="linear")
        optimizer = optax.adam(1e-3)
        epochs = args.epochs

    rs = np.random.RandomState(args.seed)
    idx = rs.permutation(len(ds))
    k = max(args.folds, 1)
    fold_size = max(len(ds) // (5 if k == 1 else k), 1)

    def to_batch(part):
        graphs = []
        for g in part:
            g = dict(g)
            g.pop("node_importances_true", None)
            graphs.append(g)
        return batch_graphs(graphs, global_keys=("graph_labels",))

    def loss_fn(p, b):
        out = model.apply(p, b)
        return masked_graph_mae(out["output"], b.globals["graph_labels"],
                                b.globals["graph_mask"]), out

    @jax.jit
    def step(p, s, b):
        (l, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(p, b)
        updates, s = optimizer.update(grads, s, p)
        return optax.apply_updates(p, updates), s, l

    hists, times = [], []
    for fold in range(k):
        test_idx = idx[fold * fold_size:(fold + 1) * fold_size]
        train_idx = np.setdiff1d(idx, test_idx)
        test, train = ds[test_idx], ds[train_idx]
        train_batch, test_batch = to_batch(train), to_batch(test)
        params = model.init(jax.random.PRNGKey(args.seed + fold), train_batch)
        opt_state = optimizer.init(params)

        t0 = time.perf_counter()
        hist = {"loss": []}
        for epoch in range(epochs):
            params, opt_state, loss = step(params, opt_state, train_batch)
            if epoch % 10 == 9:
                hist["loss"].append(float(loss))

        out = model.apply(params, test_batch)
        val_mae = float(masked_graph_mae(out["output"],
                                         test_batch.globals["graph_labels"],
                                         test_batch.globals["graph_mask"]))
        hist["val_mae"] = [val_mae]

        # explanation quality: node-importance AUC vs ground truth
        aucs = []
        if "node_importances" in out and "node_importances_true" in test[0]:
            imp = np.asarray(out["node_importances"]).max(axis=-1)
            nm = np.asarray(test_batch.node_mask)
            gid = np.asarray(test_batch.graph_id)
            for i, g in enumerate(test):
                sel = nm & (gid == i)
                auc = importance_auc(imp[sel], np.asarray(
                    g["node_importances_true"]))
                if np.isfinite(auc):
                    aucs.append(auc)
        node_auc = float(np.mean(aucs)) if aucs else float("nan")
        hist["val_node_auc"] = [node_auc]
        times.append(time.perf_counter() - t0)
        hists.append(hist)

    from gcnn_keras_tpu.utils.plots import plot_train_test_loss
    plot_train_test_loss(hists, loss_name="loss", val_loss_name="val_mae",
                         model_name=args.model, dataset_name=args.dataset,
                         filepath="results/vgd",
                         file_name=f"{args.model}_loss.png")
    save_history_score(
        hists, f"results/vgd/{args.model}_score.yaml",
        model_name=args.model, dataset_name=args.dataset, seed=args.seed,
        time_list=times)
    print(json.dumps({"val_mae": val_mae, "val_node_auc": node_auc}))


if __name__ == "__main__":
    main()
