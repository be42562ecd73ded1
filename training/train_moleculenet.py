"""MoleculeNet property prediction driver (parity: reference
``training/train_moleculenet.py``): SMILES datasets with RDKit attributes
(falls back to a synthetic attributed dataset when rdkit/data are absent)."""
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
    ap.add_argument("--dataset", default=None, help="ESOL/FreeSolv/Lipop")
    ap.add_argument("--epochs", type=int, default=60)
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--folds", type=int, default=3)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--steps-per-dispatch", type=int, default=1,
                    help="fuse K same-shape optimizer steps into one "
                         "jitted dispatch (see PERF.md r3)")
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
    from gcnn_keras_tpu.data.loader import GraphBatchLoader
    from gcnn_keras_tpu.data.scalers import StandardLabelScaler
    from gcnn_keras_tpu.models.registry import get_model_class
    from gcnn_keras_tpu.training.losses import masked_graph_mae
    from gcnn_keras_tpu.training.history import save_history_score
    from gcnn_keras_tpu.utils.data_splitter import kfold_indices

    if args.dataset:
        import importlib
        mod = importlib.import_module("gcnn_keras_tpu.data.datasets.moleculenet")
        ds = getattr(mod, f"{args.dataset}Dataset")()
        ds.read_in_memory()
    else:
        # synthetic attributed molecular graphs with a structure-dependent label
        rs = np.random.RandomState(args.seed)
        from gcnn_keras_tpu.data.dataset import MemoryGraphDataset
        ds = MemoryGraphDataset(dataset_name="SyntheticMolNet")
        for _ in range(96):
            n = rs.randint(5, 15)
            ei = []
            for i in range(1, n):
                j = rs.randint(i)  # random tree + extra edges
                ei += [[i, j], [j, i]]
            for _ in range(n // 3):
                a, b_ = rs.randint(n, size=2)
                if a != b_:
                    ei += [[a, b_], [b_, a]]
            ei = np.unique(np.array(ei, dtype=np.int64), axis=0)
            feats = rs.randn(n, 16).astype(np.float32)
            m = ei.shape[0]
            eattr = rs.randn(m, 8).astype(np.float32)
            label = float(feats[:, 0].sum() * 0.3 + m * 0.05)
            ds.append({"node_attributes": feats, "edge_indices": ei,
                       "edge_attributes": eattr,
                       "graph_labels": np.array([label], dtype=np.float32)})

    y = np.array([float(np.asarray(g["graph_labels"]).reshape(-1)[0]) for g in ds])
    builder = get_model_class(args.model)

    histories, times = [], []
    for fold, (tr, te) in enumerate(kfold_indices(len(ds), k=args.folds,
                                                  seed=args.seed)):
        scaler = StandardLabelScaler()
        y_tr = scaler.fit(y[tr][:, None]).transform(y[tr][:, None])[:, 0]
        y_te = scaler.transform(y[te][:, None])[:, 0]
        train, test = ds[tr], ds[te]
        for g, yy in zip(train, y_tr):
            g["graph_labels"] = np.array([yy], dtype=np.float32)
        for g, yy in zip(test, y_te):
            g["graph_labels"] = np.array([yy], dtype=np.float32)

        if args.model == "GIN":
            model = builder(depth=3,
                            gin_mlp={"units": [64, 64], "activation": ["relu", "linear"]},
                            last_mlp={"units": [64], "activation": ["relu"]},
                            output_mlp={"units": [1], "activation": ["linear"]})
        else:
            model = builder()
        optimizer = optax.adam(1e-3)
        hint = train.batch_shape_hint(args.batch_size)
        loader = GraphBatchLoader(list(train), args.batch_size, shuffle=True,
                                  seed=args.seed, global_keys=("graph_labels",),
                                  **hint)
        first = next(iter(loader))
        params = model.init(jax.random.PRNGKey(fold), first, train=False)

        def loss_fn(p, b):
            out = model.apply(p, b, train=False)["output"]
            return masked_graph_mae(out, b.globals["graph_labels"],
                                    b.globals["graph_mask"]), {}

        from gcnn_keras_tpu.training.trainer import Trainer
        trainer = Trainer(loss_fn, optimizer)
        state = trainer.init_state(params)

        test_batch = test.to_batch(global_keys=("graph_labels",))
        scale = float(scaler.get_scaling()[0])

        def eval_fn(p):
            out = model.apply(p, test_batch, train=False)["output"]
            vm = float(masked_graph_mae(out, test_batch.globals["graph_labels"],
                                        test_batch.globals["graph_mask"]))
            return {"val_loss": vm, "val_scaled_mae": vm * scale}

        from gcnn_keras_tpu.training.fit import fit_model
        if args.use_wandb:
            from gcnn_keras_tpu.utils.wandb_wizard import init_wandb
            init_wandb("gcnn_keras_tpu",
                       name=f"molnet_{args.model}_fold{fold}",
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
            out = model.apply(params, test_batch, train=False)["output"]
            gm = np.asarray(test_batch.globals["graph_mask"], bool).reshape(-1)
            plot_predict_true(
                np.asarray(out).reshape(-1)[gm],
                np.asarray(test_batch.globals["graph_labels"]).reshape(-1)[gm],
                model_name=args.model,
                dataset_name=args.dataset or "SyntheticMolNet",
                target_names="graph_labels",
                filepath=f"results/moleculenet/{args.model}_fold{fold}",
                file_name="predict.png")

    if args.plots:
        from gcnn_keras_tpu.utils.plots import plot_train_test_loss
        plot_train_test_loss(histories, loss_name="loss",
                             val_loss_name="val_loss", model_name=args.model,
                             dataset_name=args.dataset or "SyntheticMolNet",
                             filepath="results/moleculenet",
                             file_name=f"{args.model}_loss.png")
    score = save_history_score(histories,
                               f"results/moleculenet/{args.model}_score.yaml",
                               model_name=args.model,
                               dataset_name=args.dataset or "synthetic",
                               seed=args.seed, time_list=times)
    print(json.dumps({"val_scaled_mae_mean": score.get("val_scaled_mae_mean")}))


if __name__ == "__main__":
    main()
