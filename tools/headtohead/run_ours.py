"""Train THIS framework on the exported head-to-head data (CPU, to match
the reference's TF-CPU runs — this comparison is about ACCURACY under an
identical protocol, not throughput).

Mirrors ``run_reference.py`` exactly: same data (verbatim npz), same model
configs (parity-proven in tests/test_force_parity.py), same losses
(MSE energy+force, weights [1/F, 1-1/F]), same Adam (keras eps=1e-7), same
per-epoch linear LR schedule, same batch size and epoch count.

Usage: python tools/headtohead/run_ours.py --model schnet --seed 0
Writes tools/headtohead/results/ours_<model>_s<seed>.json
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
import optax

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, os.path.dirname(__file__))

from protocol import (BATCH_SIZE, CHARGE_EPOCHS, CRYSTAL_BATCH,
                      CRYSTAL_EPOCHS, EPOCHS, FORCE_LOSS_FACTOR, GCN_EPOCHS,
                      GCN_LR, HDNNP_KW, LR_START, LR_STOP, MLP_KW, linear_lr,
                      load_crystal, load_md)

from gcnn_keras_tpu.batch import batch_graphs
from gcnn_keras_tpu.model.force import EnergyForceModel

HERE = os.path.dirname(__file__)
RESULTS = os.path.join(HERE, "results")


def frame_to_graph(f, model):
    g = {"node_number": f["z"].astype(np.int64),
         "node_coordinates": f["xyz"].astype(np.float32),
         "edge_indices": f["edge_indices"].astype(np.int64),
         "force": f["force"].astype(np.float32),
         "energy": f["energy"].astype(np.float32)}
    if model in ("hdnnp2nd", "hdnnp4th"):
        g["angle_indices_nodes"] = f["angle_indices_nodes"].astype(np.int64)
    if model == "hdnnp4th":
        g["esp"] = f["esp"].astype(np.float32)
        g["esp_grad"] = f["esp_grad"].astype(np.float32)
        g["total_charge"] = f["total_charge"].astype(np.float32)
    return g


def pad_shape(graphs, n_graphs, model):
    """One static batch shape for all batches of up to ``n_graphs``."""
    n_max = max(len(g["node_number"]) for g in graphs)
    e_max = max(len(g["edge_indices"]) for g in graphs)
    kw = dict(n_node_pad=n_graphs * n_max + 1,
              n_edge_pad=n_graphs * e_max + 1,
              n_graph_pad=n_graphs + 1)
    if model in ("hdnnp2nd", "hdnnp4th"):
        a_max = max(len(g["angle_indices_nodes"]) for g in graphs)
        kw["n_angle_pad"] = n_graphs * a_max + 1
    return kw


def build_model(model, seed):
    if model == "schnet":
        from gcnn_keras_tpu.models.schnet import make_model
        energy = make_model(depth=2)
        esp = False
    elif model == "painn":
        from gcnn_keras_tpu.models.painn import make_model
        energy = make_model(depth=2)
        esp = False
    elif model == "hdnnp2nd":
        from gcnn_keras_tpu.models.hdnnp2nd import make_model_behler
        energy = make_model_behler(mlp_kwargs=dict(MLP_KW), **HDNNP_KW)
        esp = False
    elif model == "hdnnp4th":
        from gcnn_keras_tpu.models.hdnnp4th import make_model_behler
        energy = make_model_behler(
            mlp_charge_kwargs=dict(MLP_KW), mlp_local_kwargs=dict(MLP_KW),
            output_embedding="charge+qm_energy", **HDNNP_KW)
        esp = True
    else:
        raise ValueError(model)
    return EnergyForceModel(energy, use_esp_coupling=esp,
                            is_physical_force=False), esp


def run_md(model_name, seed):
    frames, splits = load_md(os.path.join(HERE, "data", "md.npz"))
    tr_idx, va_idx = splits[seed]
    train = [frame_to_graph(frames[i], model_name) for i in tr_idx]
    val = [frame_to_graph(frames[i], model_name) for i in va_idx]

    gk = ("total_charge",) if model_name == "hdnnp4th" else ()
    bshape = pad_shape(train + val, BATCH_SIZE, model_name)
    vshape = pad_shape(train + val, len(val), model_name)
    val_batch = batch_graphs(val, global_keys=gk, **vshape)

    fmodel, _ = build_model(model_name, seed)
    first = batch_graphs(train[:BATCH_SIZE], global_keys=gk, **bshape)
    params = fmodel.init(jax.random.PRNGKey(seed), first)

    steps_per_epoch = (len(train) + BATCH_SIZE - 1) // BATCH_SIZE

    def lr_schedule(count):
        # keras LearningRateScheduler sets LR once per epoch; traced-safe
        # version of protocol.linear_lr
        epoch = count // steps_per_epoch
        from protocol import EPOCHS as E, LR_START as A, LR_STOP as B
        return jnp.maximum(A - (A - B) / E * epoch, 1e-8)

    # keras Adam default epsilon is 1e-7 (optax default is 1e-8)
    optimizer = optax.adam(lr_schedule, eps=1e-7)
    opt_state = optimizer.init(params)

    wf = 1.0 / FORCE_LOSS_FACTOR

    def loss_fn(p, b):
        out = fmodel.apply(p, b)
        gmask = b.globals["graph_mask"].astype(jnp.float32)
        e_err = (out["energy"].reshape(-1) - b.globals["energy"].reshape(-1)) ** 2
        le = jnp.sum(e_err * gmask) / jnp.maximum(jnp.sum(gmask), 1.0)
        nmask = b.node_mask.astype(jnp.float32)
        f_err = jnp.mean((out["force"] - b.nodes["force"]) ** 2, axis=-1)
        lf = jnp.sum(f_err * nmask) / jnp.maximum(jnp.sum(nmask), 1.0)
        return wf * le + (1.0 - wf) * lf

    @jax.jit
    def step(p, s, b):
        l, g = jax.value_and_grad(loss_fn)(p, b)
        up, s = optimizer.update(g, s, p)
        return optax.apply_updates(p, up), s, l

    rs = np.random.RandomState(seed + 777)
    t0 = time.time()
    for epoch in range(EPOCHS):
        order = rs.permutation(len(train))
        for k in range(steps_per_epoch):
            sel = [train[i] for i in order[k * BATCH_SIZE:(k + 1) * BATCH_SIZE]]
            b = batch_graphs(sel, global_keys=gk, **bshape)
            params, opt_state, _ = step(params, opt_state, b)
    train_time = time.time() - t0

    out = fmodel.apply(params, val_batch)
    gm = np.asarray(val_batch.globals["graph_mask"]).astype(bool)
    e_pred = np.asarray(out["energy"]).reshape(-1)[gm]
    e_true = np.asarray(val_batch.globals["energy"]).reshape(-1)[gm]
    e_mae = float(np.mean(np.abs(e_pred - e_true)))
    nm = np.asarray(val_batch.node_mask).astype(bool)
    f_pred = np.asarray(out["force"])[nm]
    f_true = np.asarray(val_batch.nodes["force"])[nm]
    f_mae = float(np.mean(np.abs(f_pred - f_true)))
    return {"framework": "ours", "model": model_name, "seed": seed,
            "val_energy_mae": e_mae, "val_force_mae": f_mae,
            "train_seconds": train_time, "epochs": EPOCHS}


def _epoch_linear_lr(steps_per_epoch, total_epochs):
    def lr_schedule(count):
        epoch = count // steps_per_epoch
        return jnp.maximum(
            LR_START - (LR_START - LR_STOP) / total_epochs * epoch, 1e-8)
    return lr_schedule


def run_charge(seed):
    """Charge-only HDNNP4th (mirrors /root/reference/charge_hdnnp4th.py)."""
    from gcnn_keras_tpu.models.hdnnp4th import make_model_behler

    frames, splits = load_md(os.path.join(HERE, "data", "md.npz"))
    tr_idx, va_idx = splits[seed]

    def to_graph(f):
        g = frame_to_graph(f, "hdnnp4th")
        g["charge"] = f["charge"].astype(np.float32)
        return g

    train = [to_graph(frames[i]) for i in tr_idx]
    val = [to_graph(frames[i]) for i in va_idx]
    gk = ("total_charge",)
    bshape = pad_shape(train + val, BATCH_SIZE, "hdnnp4th")
    vshape = pad_shape(train + val, len(val), "hdnnp4th")
    val_batch = batch_graphs(val, global_keys=gk, **vshape)

    model = make_model_behler(
        mlp_charge_kwargs=dict(MLP_KW), mlp_local_kwargs=dict(MLP_KW),
        output_embedding="charge", **HDNNP_KW)
    first = batch_graphs(train[:BATCH_SIZE], global_keys=gk, **bshape)
    params = model.init(jax.random.PRNGKey(seed), first)

    steps_per_epoch = (len(train) + BATCH_SIZE - 1) // BATCH_SIZE
    optimizer = optax.adam(_epoch_linear_lr(steps_per_epoch, CHARGE_EPOCHS),
                           eps=1e-7)
    opt_state = optimizer.init(params)

    def loss_fn(p, b):
        q = model.apply(p, b)["output"].reshape(-1)
        nmask = b.node_mask.astype(jnp.float32)
        err = (q - b.nodes["charge"].reshape(-1)) ** 2
        return jnp.sum(err * nmask) / jnp.maximum(jnp.sum(nmask), 1.0)

    @jax.jit
    def step(p, s, b):
        l, g = jax.value_and_grad(loss_fn)(p, b)
        up, s = optimizer.update(g, s, p)
        return optax.apply_updates(p, up), s, l

    rs = np.random.RandomState(seed + 777)
    t0 = time.time()
    for epoch in range(CHARGE_EPOCHS):
        order = rs.permutation(len(train))
        for k in range(steps_per_epoch):
            sel = [train[i]
                   for i in order[k * BATCH_SIZE:(k + 1) * BATCH_SIZE]]
            b = batch_graphs(sel, global_keys=gk, **bshape)
            params, opt_state, _ = step(params, opt_state, b)
    train_time = time.time() - t0

    q = np.asarray(model.apply(params, val_batch)["output"]).reshape(-1)
    nm = np.asarray(val_batch.node_mask).astype(bool)
    q_true = np.asarray(val_batch.nodes["charge"]).reshape(-1)
    q_mae = float(np.mean(np.abs(q[nm] - q_true[nm])))
    return {"framework": "ours", "model": "charge", "seed": seed,
            "val_charge_mae": q_mae, "train_seconds": train_time,
            "epochs": CHARGE_EPOCHS}


def run_crystal(seed):
    """Periodic Schnet on the precomputed crystal graphs."""
    from gcnn_keras_tpu.models.schnet import make_crystal_model
    from gcnn_keras_tpu.training.losses import masked_graph_mae

    cells, splits = load_crystal(os.path.join(HERE, "data", "crystal.npz"))
    tr_idx, va_idx = splits[seed]

    def to_graph(c):
        return {"node_number": c["z"].astype(np.int64),
                "node_coordinates": c["xyz"].astype(np.float32),
                "edge_indices": c["edge_indices"].astype(np.int64),
                "range_image": c["edge_image"].astype(np.float32),
                "graph_lattice": c["lattice"].astype(np.float32),
                "label": c["label"].astype(np.float32)}

    train = [to_graph(cells[i]) for i in tr_idx]
    val = [to_graph(cells[i]) for i in va_idx]
    gk = ("label", "graph_lattice")
    n_max = max(len(g["node_number"]) for g in train + val)
    e_max = max(len(g["edge_indices"]) for g in train + val)
    bshape = dict(n_node_pad=CRYSTAL_BATCH * n_max + 1,
                  n_edge_pad=CRYSTAL_BATCH * e_max + 1,
                  n_graph_pad=CRYSTAL_BATCH + 1)
    vshape = dict(n_node_pad=len(val) * n_max + 1,
                  n_edge_pad=len(val) * e_max + 1,
                  n_graph_pad=len(val) + 1)
    val_batch = batch_graphs(val, global_keys=gk, **vshape)

    model = make_crystal_model(depth=2)
    first = batch_graphs(train[:CRYSTAL_BATCH], global_keys=gk, **bshape)
    params = model.init(jax.random.PRNGKey(seed), first)

    steps_per_epoch = (len(train) + CRYSTAL_BATCH - 1) // CRYSTAL_BATCH
    optimizer = optax.adam(_epoch_linear_lr(steps_per_epoch, CRYSTAL_EPOCHS),
                           eps=1e-7)
    opt_state = optimizer.init(params)

    def loss_fn(p, b):
        out = model.apply(p, b)["output"].reshape(-1)
        gm = b.globals["graph_mask"].astype(jnp.float32)
        err = (out - b.globals["label"].reshape(-1)) ** 2
        return jnp.sum(err * gm) / jnp.maximum(jnp.sum(gm), 1.0)

    @jax.jit
    def step(p, s, b):
        l, g = jax.value_and_grad(loss_fn)(p, b)
        up, s = optimizer.update(g, s, p)
        return optax.apply_updates(p, up), s, l

    rs = np.random.RandomState(seed + 777)
    t0 = time.time()
    for epoch in range(CRYSTAL_EPOCHS):
        order = rs.permutation(len(train))
        for k in range(steps_per_epoch):
            sel = [train[i]
                   for i in order[k * CRYSTAL_BATCH:(k + 1) * CRYSTAL_BATCH]]
            b = batch_graphs(sel, global_keys=gk, **bshape)
            params, opt_state, _ = step(params, opt_state, b)
    train_time = time.time() - t0

    out = np.asarray(model.apply(params, val_batch)["output"]).reshape(-1)
    gm = np.asarray(val_batch.globals["graph_mask"]).astype(bool)
    y = np.asarray(val_batch.globals["label"]).reshape(-1)
    mae = float(np.mean(np.abs(out[gm] - y[gm])))
    return {"framework": "ours", "model": "crystal_schnet", "seed": seed,
            "val_mae": mae, "train_seconds": train_time,
            "epochs": CRYSTAL_EPOCHS}


def run_gcn(seed):
    from gcnn_keras_tpu.models.gcn import make_model

    d = np.load(os.path.join(HERE, "data", "cora.npz"))
    na, ei, ew = d["node_attributes"], d["edge_indices"], d["edge_weights"]
    labels = d["node_labels"]
    c = int(d["num_classes"])
    tm = d[f"split{seed}_train_mask"]
    vm = d[f"split{seed}_val_mask"]

    g = {"node_attributes": na.astype(np.float32),
         "edge_indices": ei.astype(np.int64),
         "edge_weights": ew.astype(np.float32)}
    batch = batch_graphs([g], n_node_pad=len(na) + 1,
                         n_edge_pad=len(ei) + 1, n_graph_pad=2)

    model = make_model(
        input_embedding={"node": {"input_dim": 95, "output_dim": 64}},
        gcn_args={"units": 64, "use_bias": True, "activation": "relu"},
        depth=3, output_embedding="node",
        output_mlp={"use_bias": [True, True, False], "units": [64, 32, c],
                    "activation": ["relu", "relu", "linear"]})
    params = model.init(jax.random.PRNGKey(seed), batch)

    y = np.zeros(batch.n_node, dtype=np.int32)
    y[:len(labels)] = labels
    y = jnp.asarray(y)
    w = np.zeros(batch.n_node, dtype=np.float32)
    w[:len(labels)] = tm.astype(np.float32)
    w = jnp.asarray(w)

    optimizer = optax.adam(GCN_LR, eps=1e-7)
    opt_state = optimizer.init(params)

    def loss_fn(p):
        logits = model.apply(p, batch)["output"]
        # EXACT keras categorical_crossentropy-from-softmax semantics
        # (tf_keras backend.categorical_crossentropy: probabilities
        # clipped to [eps, 1-eps] with eps=1e-7 before the log) — the
        # clip's zero-gradient region changes training dynamics vs plain
        # logits cross-entropy on saturated classes
        probs = jax.nn.softmax(logits, axis=-1)
        probs = jnp.clip(probs, 1e-7, 1.0 - 1e-7)
        onehot = jax.nn.one_hot(y, probs.shape[-1])
        ll = -jnp.sum(onehot * jnp.log(probs), axis=-1)
        # keras sample_weight semantics: sum(w*l)/sum(w)
        return jnp.sum(ll * w) / jnp.maximum(jnp.sum(w), 1.0)

    @jax.jit
    def step(p, s):
        l, grad = jax.value_and_grad(loss_fn)(p)
        up, s = optimizer.update(grad, s, p)
        return optax.apply_updates(p, up), s, l

    t0 = time.time()
    for _ in range(GCN_EPOCHS):
        params, opt_state, _ = step(params, opt_state)
    train_time = time.time() - t0
    logits = np.asarray(model.apply(params, batch)["output"])[:len(labels)]
    acc = float((logits[vm].argmax(-1) == labels[vm]).mean())
    return {"framework": "ours", "model": "gcn", "seed": seed,
            "val_accuracy": acc, "train_seconds": train_time,
            "epochs": GCN_EPOCHS}


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True,
                    choices=["schnet", "painn", "hdnnp2nd", "hdnnp4th",
                             "gcn", "charge", "crystal_schnet"])
    ap.add_argument("--seed", type=int, required=True)
    ap.add_argument("--epochs", type=int, default=None)
    args = ap.parse_args()
    if args.epochs:
        import protocol
        protocol.EPOCHS = EPOCHS = args.epochs
        protocol.GCN_EPOCHS = GCN_EPOCHS = args.epochs
        protocol.CHARGE_EPOCHS = CHARGE_EPOCHS = args.epochs
        protocol.CRYSTAL_EPOCHS = CRYSTAL_EPOCHS = args.epochs

    os.makedirs(RESULTS, exist_ok=True)
    runners = {"gcn": run_gcn, "charge": run_charge,
               "crystal_schnet": run_crystal}
    if args.model in runners:
        res = runners[args.model](args.seed)
    else:
        res = run_md(args.model, args.seed)
    out = os.path.join(RESULTS, f"ours_{args.model}_s{args.seed}.json")
    with open(out, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res))
