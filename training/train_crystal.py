"""Crystal property regression driver (parity: reference
``training/train_crystal.py``): periodic structures -> radius graphs ->
Schnet/Megnet/CGCNN crystal models."""
from __future__ import annotations

import argparse
import json
import time

import numpy as np

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synthetic_crystals(n=64, seed=0):
    """Random periodic structures with a synthetic cohesive-energy label."""
    from gcnn_keras_tpu.crystal.graph_builder import structure_to_graph, add_radius_bonds
    rs = np.random.RandomState(seed)
    out = []
    for _ in range(n):
        na = rs.randint(2, 7)
        a = 3.5 + rs.rand() * 2
        lattice = np.diag([a, a, a]) + rs.randn(3, 3) * 0.1
        frac = rs.rand(na, 3)
        z = rs.choice([3, 8, 13, 14, 26], size=na)
        g = structure_to_graph({"frac_coords": frac, "lattice": lattice,
                                "atomic_numbers": z})
        g = add_radius_bonds(g, radius=4.0, max_neighbours=12)
        d = np.asarray(g["range_attributes"]).reshape(-1)
        label = float(np.exp(-d).sum() / na + 0.05 * z.mean())
        g["graph_labels"] = np.array([label], dtype=np.float32)
        g["edge_indices"] = g["range_indices"]
        out.append(g)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="Schnet")
    ap.add_argument("--epochs", type=int, default=40)
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--structures", type=int, default=64)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--steps-per-dispatch", type=int, default=1,
                    help="fuse K same-shape optimizer steps into one "
                         "jitted dispatch (see PERF.md r3)")
    ap.add_argument("--folds", type=int, default=1,
                    help="k-fold cross-validation like the reference's "
                         "5-fold (1 = single 80/20 split)")
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
    from gcnn_keras_tpu.data.dataset import MemoryGraphDataset
    from gcnn_keras_tpu.data.loader import GraphBatchLoader
    from gcnn_keras_tpu.models.registry import get_model_class
    from gcnn_keras_tpu.training.losses import masked_graph_mae
    from gcnn_keras_tpu.training.history import save_history_score

    ds = MemoryGraphDataset(graphs=synthetic_crystals(args.structures, args.seed))
    builder = get_model_class(args.model, "make_crystal_model")
    if args.model == "Schnet":
        model = builder(depth=3, interaction_args={"units": 64},
                        gauss_args={"bins": 20, "distance_max": 4.0},
                        last_mlp={"units": [64, 32],
                                  "activation": ["shifted_softplus"] * 2},
                        output_mlp={"units": [16, 1],
                                    "activation": ["shifted_softplus", "linear"]})
    elif args.model == "CGCNN":
        model = builder(depth=3, conv_layer_args={"units": 64})
    else:
        model = builder()
    optimizer = optax.adam(1e-3)

    rs = np.random.RandomState(args.seed)
    idx = rs.permutation(len(ds))
    k = max(args.folds, 1)
    fold_size = max(len(ds) // (5 if k == 1 else k), 1)

    def loss_fn(p, b):
        out = model.apply(p, b, train=False)["output"]
        return masked_graph_mae(out, b.globals["graph_labels"],
                                b.globals["graph_mask"]), {}

    from gcnn_keras_tpu.training.trainer import Trainer
    trainer = Trainer(loss_fn, optimizer)

    hists, times = [], []
    for fold in range(k):
        test_idx = idx[fold * fold_size:(fold + 1) * fold_size]
        train_idx = np.setdiff1d(idx, test_idx)
        train, test = ds[train_idx], ds[test_idx]
        hint = train.batch_shape_hint(args.batch_size)
        loader = GraphBatchLoader(list(train), args.batch_size, shuffle=True,
                                  seed=args.seed + fold,
                                  global_keys=("graph_labels",), **hint)
        first = next(iter(loader))
        params = model.init(jax.random.PRNGKey(args.seed + fold), first,
                            train=False)
        state = trainer.init_state(params)
        test_batch = test.to_batch(global_keys=("graph_labels",))

        def eval_fn(p):
            out = model.apply(p, test_batch, train=False)["output"]
            vm = float(masked_graph_mae(out,
                                        test_batch.globals["graph_labels"],
                                        test_batch.globals["graph_mask"]))
            return {"val_loss": vm, "val_mae": vm}

        from gcnn_keras_tpu.training.fit import fit_model
        if args.use_wandb:
            from gcnn_keras_tpu.utils.wandb_wizard import init_wandb
            init_wandb("gcnn_keras_tpu",
                       name=f"crystal_{args.model}_fold{fold}",
                       config=vars(args))
        t0 = time.perf_counter()
        state, hist = fit_model(trainer, state, loader, eval_fn, args.epochs,
                                steps_per_dispatch=args.steps_per_dispatch,
                                early_stopping=args.early_stopping, fold=fold)
        times.append(time.perf_counter() - t0)
        if args.use_wandb:
            from gcnn_keras_tpu.utils.wandb_wizard import finish_wandb
            finish_wandb()
        params = state.params
        hists.append(hist)

        if args.plots:
            from gcnn_keras_tpu.utils.plots import plot_predict_true
            out = model.apply(params, test_batch, train=False)["output"]
            gm = np.asarray(test_batch.globals["graph_mask"], bool).reshape(-1)
            plot_predict_true(
                np.asarray(out).reshape(-1)[gm],
                np.asarray(test_batch.globals["graph_labels"]).reshape(-1)[gm],
                model_name=args.model, dataset_name="SyntheticCrystal",
                target_names="graph_labels",
                filepath=f"results/crystal/{args.model}_fold{fold}",
                file_name="predict.png")

    if args.plots:
        from gcnn_keras_tpu.utils.plots import plot_train_test_loss
        plot_train_test_loss(hists, loss_name="loss", val_loss_name="val_loss",
                             model_name=args.model,
                             dataset_name="SyntheticCrystal",
                             filepath="results/crystal",
                             file_name=f"{args.model}_loss.png")
    score = save_history_score(hists, f"results/crystal/{args.model}_score.yaml",
                               model_name=args.model,
                               dataset_name="SyntheticCrystal",
                               seed=args.seed, time_list=times)
    print(json.dumps({"val_mae_mean": score.get("val_mae_mean")}))


if __name__ == "__main__":
    main()
