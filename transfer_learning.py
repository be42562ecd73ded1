"""Transfer learning (parity: reference ``transfer_learning.py``, 235 LoC):
reload a saved checkpoint, freeze the descriptor/representation layers,
retrain only the head MLPs on new data."""
from __future__ import annotations

import argparse
import json

import numpy as np


def freeze_mask(params, trainable_prefixes):
    """optax-style label tree: 'trainable' for matching top-level modules."""
    import jax
    from gcnn_keras_tpu.utils.devices import honor_platform_env
    honor_platform_env()

    def label(path, _):
        name = "/".join(str(p.key) for p in path if hasattr(p, "key"))
        return "trainable" if any(name.startswith(p) or p in name
                                  for p in trainable_prefixes) else "frozen"

    return jax.tree_util.tree_map_with_path(label, params)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--script", default="force_hdnnp4th")
    ap.add_argument("--data-path", default=None)
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--trainable", nargs="+", default=["mlp_local", "output"],
                    help="module-name prefixes to keep trainable")
    ap.add_argument("--out", default="model_transfer")
    args = ap.parse_args()

    import importlib
    import jax
    import optax
    from gcnn_keras_tpu.utils.checkpoint import load_checkpoint, save_checkpoint
    from gcnn_keras_tpu.training.force_script import load_force_dataset
    from gcnn_keras_tpu.training.losses import masked_graph_mae, masked_node_mae
    from gcnn_keras_tpu.data.loader import GraphBatchLoader
    from gcnn_keras_tpu.data.scalers import EnergyForceExtensiveLabelScaler

    from gcnn_keras_tpu.training.force_script import script_config
    mod = importlib.import_module(args.script)
    cfg = script_config(mod, data_path=args.data_path)
    ds = mod.load_dataset(cfg) if hasattr(mod, "load_dataset") \
        else load_force_dataset(cfg)
    fmodel = mod.build_model(cfg)
    state = load_checkpoint(args.checkpoint)
    params = state["params"]

    scaler = EnergyForceExtensiveLabelScaler()
    scaler.fit_dataset(ds)
    scaler.transform_dataset(ds)

    hint = ds.batch_shape_hint(8)
    loader = GraphBatchLoader(list(ds), 8, shuffle=True,
                              global_keys=("energy", "total_charge"), **hint)

    labels = freeze_mask(params, args.trainable)
    optimizer = optax.multi_transform(
        {"trainable": optax.adam(1e-4), "frozen": optax.set_to_zero()}, labels)
    opt_state = optimizer.init(params)

    def loss_fn(p, b):
        out = fmodel.apply(p, b, train=False)
        le = masked_graph_mae(out["energy"], b.globals["energy"],
                              b.globals["graph_mask"])
        lf = masked_node_mae(out["force"], b.nodes["force"], b.node_mask) \
            if "force" in out and "force" in b.nodes else 0.0
        return le + 100.0 * lf, {}

    @jax.jit
    def step(p, s, b):
        (l, _), g = jax.value_and_grad(loss_fn, has_aux=True)(p, b)
        up, s = optimizer.update(g, s, p)
        return optax.apply_updates(p, up), s, l

    for epoch in range(args.epochs):
        losses = []
        for b in loader:
            params, opt_state, l = step(params, opt_state, b)
            losses.append(float(l))
        if epoch % 5 == 0 or epoch == args.epochs - 1:
            print(f"epoch {epoch}: loss={np.mean(losses):.4f}")

    save_checkpoint(args.out, params, opt_state=opt_state, step=args.epochs)
    scaler.save(f"{args.out}/scaler.json")
    print(json.dumps({"saved": args.out}))


if __name__ == "__main__":
    main()
