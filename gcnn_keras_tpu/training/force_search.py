"""Shared Hyperband-search scaffold for the fork's ``*_hyp_param_search.py``
scripts (parity: reference ``force_schnet_hyp_param_search.py``,
``force_painn_hyp_param_search.py``, ``force_hdnnp2nd_hyp_param_search.py``,
``charge_hyp_param_search.py`` — all keras-tuner Hyperband with objective
``val_force_loss`` / ``val_charge_loss``).

Each root script supplies a ``build_model(hp, cfg)`` factory and a search
space; this module owns the data split, scaler, trial training loop, and the
Hyperband driver.
"""
from __future__ import annotations

import argparse
from typing import Callable, Dict, Optional

import numpy as np

from .hyper_search import SearchSpace, HyperbandSearch


def parse_search_cli(defaults: Dict, directory: str) -> argparse.Namespace:
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=9)
    ap.add_argument("--max-epochs", type=int, default=30)
    ap.add_argument("--data-path", default=None)
    ap.add_argument("--directory", default=directory)
    return ap.parse_args()


def run_force_search(cfg0: Dict, space_spec: Dict,
                     build_model: Callable[[Dict, Dict], object],
                     objective: str = "val_force_mae",
                     args: Optional[argparse.Namespace] = None,
                     load_dataset: Optional[Callable] = None):
    """Run a Hyperband search over ``space_spec``; returns the best trial."""
    import jax
    from ..utils.devices import honor_platform_env
    honor_platform_env()
    import optax
    from ..data.scalers import EnergyForceExtensiveLabelScaler
    from ..data.loader import GraphBatchLoader
    from .force_script import load_force_dataset
    from .losses import masked_graph_mae, masked_node_mae

    if args is not None and args.data_path:
        cfg0 = dict(cfg0, data_path=args.data_path)
    ds = (load_dataset or load_force_dataset)(cfg0)
    rs = np.random.RandomState(cfg0.get("seed", 0))
    idx = rs.permutation(len(ds))
    n_val = max(len(ds) // 5, 1)
    val, train = ds[idx[:n_val]], ds[idx[n_val:]]
    scaler = EnergyForceExtensiveLabelScaler()
    scaler.fit_dataset(train)
    scaler.transform_dataset(train)
    scaler.transform_dataset(val)

    global_keys = ["energy"]
    if "total_charge" in train[0]:
        global_keys.append("total_charge")
    global_keys = tuple(global_keys)

    def trial_fn(hp, epochs):
        fmodel = build_model(hp, cfg0)
        hint = train.batch_shape_hint(cfg0["batch_size"])
        loader = GraphBatchLoader(list(train), cfg0["batch_size"],
                                  shuffle=True, global_keys=global_keys,
                                  **hint)
        first = next(iter(loader))
        params = fmodel.init(jax.random.PRNGKey(0), first, train=False)
        opt = optax.adam(hp.get("learning_rate", 1e-3))
        opt_state = opt.init(params)
        we = cfg0.get("energy_loss_weight", 1.0)
        wf = hp.get("force_loss_weight", cfg0.get("force_loss_weight", 0.0))
        wq = cfg0.get("charge_loss_weight", 0.0)
        norm = max(we + wf + wq, 1e-8)
        we, wf, wq = we / norm, wf / norm, wq / norm

        def loss_fn(p, b):
            out = fmodel.apply(p, b, train=False)
            loss = 0.0
            if we:
                loss += we * masked_graph_mae(out["energy"],
                                              b.globals["energy"],
                                              b.globals["graph_mask"])
            if wf and "force" in out:
                loss += wf * masked_node_mae(out["force"], b.nodes["force"],
                                             b.node_mask)
            if wq and "charge" in out and "charge" in b.nodes:
                loss += wq * masked_node_mae(out["charge"], b.nodes["charge"],
                                             b.node_mask)
            return loss, {}

        @jax.jit
        def step(p, s, b):
            (l, _), g = jax.value_and_grad(loss_fn, has_aux=True)(p, b)
            up, s = opt.update(g, s, p)
            return optax.apply_updates(p, up), s, l

        for _ in range(epochs):
            for b in loader:
                params, opt_state, _ = step(params, opt_state, b)
        vb = val.to_batch(global_keys=global_keys)
        vout = fmodel.apply(params, vb, train=False)
        metrics = {}
        if "force" in vout and "force" in vb.nodes:
            metrics["val_force_mae"] = float(masked_node_mae(
                vout["force"], vb.nodes["force"], vb.node_mask))
        if "charge" in vout and "charge" in vb.nodes:
            metrics["val_charge_mae"] = float(masked_node_mae(
                vout["charge"], vb.nodes["charge"], vb.node_mask))
        metrics["val_energy_mae"] = float(masked_graph_mae(
            vout["energy"], vb.globals["energy"], vb.globals["graph_mask"]))
        return metrics

    search = HyperbandSearch(
        SearchSpace(space_spec), objective=objective,
        num_trials=args.trials if args else 9,
        max_epochs=args.max_epochs if args else 30,
        directory=args.directory if args else "hyp_search")
    best = search.run(trial_fn)
    print("best:", best["hparams"], best["score"])
    return best
