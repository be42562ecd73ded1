"""Hyperband search for HDNNP4th force training (parity: reference
``force_hdnnp4th_hyp_param_search.py``, objective val_force_loss)."""
from __future__ import annotations

import argparse

import numpy as np

from gcnn_keras_tpu.training.hyper_search import SearchSpace, HyperbandSearch


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=9)
    ap.add_argument("--max-epochs", type=int, default=30)
    ap.add_argument("--data-path", default=None)
    ap.add_argument("--directory", default="hyp_search_hdnnp4th")
    args = ap.parse_args()

    import jax
    from gcnn_keras_tpu.utils.devices import honor_platform_env
    honor_platform_env()
    import optax
    from force_hdnnp4th import CONFIG, build_model, load_dataset
    from gcnn_keras_tpu.data.scalers import EnergyForceExtensiveLabelScaler
    from gcnn_keras_tpu.data.loader import GraphBatchLoader
    from gcnn_keras_tpu.training.losses import masked_graph_mae, masked_node_mae

    cfg0 = dict(CONFIG)
    if args.data_path:
        cfg0["data_path"] = args.data_path
    ds = load_dataset(cfg0)
    rs = np.random.RandomState(0)
    idx = rs.permutation(len(ds))
    n_val = max(len(ds) // 5, 1)
    val, train = ds[idx[:n_val]], ds[idx[n_val:]]
    scaler = EnergyForceExtensiveLabelScaler()
    scaler.fit_dataset(train)
    scaler.transform_dataset(train)
    scaler.transform_dataset(val)

    space = SearchSpace({
        "mlp_width": {"choice": [32, 64, 128]},
        "mlp_depth": {"int": [2, 3]},
        "learning_rate": {"log_float": [1e-4, 5e-3]},
        "force_loss_weight": {"choice": [100.0, 200.0, 400.0]},
    })

    def trial_fn(hp, epochs):
        cfg = dict(cfg0)
        cfg["mlp_units"] = [hp["mlp_width"]] * hp["mlp_depth"] + [1]
        fmodel = build_model(cfg)
        hint = train.batch_shape_hint(cfg0["batch_size"])
        loader = GraphBatchLoader(list(train), cfg0["batch_size"], shuffle=True,
                                  global_keys=("energy", "total_charge"), **hint)
        first = next(iter(loader))
        params = fmodel.init(jax.random.PRNGKey(0), first, train=False)
        opt = optax.adam(hp["learning_rate"])
        opt_state = opt.init(params)
        wf = hp["force_loss_weight"] / (hp["force_loss_weight"] + 51.0)
        wq, we = 50.0 / (hp["force_loss_weight"] + 51.0), 1.0 / (hp["force_loss_weight"] + 51.0)

        def loss_fn(p, b):
            out = fmodel.apply(p, b, train=False)
            l = we * masked_graph_mae(out["energy"], b.globals["energy"],
                                      b.globals["graph_mask"])
            l += wf * masked_node_mae(out["force"], b.nodes["force"], b.node_mask)
            if "charge" in b.nodes:
                l += wq * masked_node_mae(out["charge"], b.nodes["charge"], b.node_mask)
            return l, {}

        @jax.jit
        def step(p, s, b):
            (l, _), g = jax.value_and_grad(loss_fn, has_aux=True)(p, b)
            up, s = opt.update(g, s, p)
            return optax.apply_updates(p, up), s, l

        for _ in range(epochs):
            for b in loader:
                params, opt_state, l = step(params, opt_state, b)
        vb = val.to_batch(global_keys=("energy", "total_charge"))
        vout = fmodel.apply(params, vb, train=False)
        return {"val_force_mae": float(masked_node_mae(
            vout["force"], vb.nodes["force"], vb.node_mask))}

    search = HyperbandSearch(space, objective="val_force_mae",
                             num_trials=args.trials,
                             max_epochs=args.max_epochs,
                             directory=args.directory)
    best = search.run(trial_fn)
    print("best:", best["hparams"], best["score"])


if __name__ == "__main__":
    main()
