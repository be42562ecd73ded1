"""Train the REFERENCE kgcnn (TF, CPU) on the exported head-to-head data.

Protocol constants live in ``protocol.py``; the model builders replicate
``tools/record_force_goldens.py`` (parity-proven configs). The fork's wrapper
settings (``/root/reference/force_schnet.py:171-203``) are used verbatim:
``EnergyForceModel(output_as_dict=False, output_squeeze_states=True,
is_physical_force=False)``, MSE losses with weights ``[1/F, 1-1/F]``,
Adam + LinearLearningRateScheduler.

Usage: TF_USE_LEGACY_KERAS=1 python -O tools/headtohead/run_reference.py \
           --model schnet --seed 0
Writes tools/headtohead/results/ref_<model>_s<seed>.json
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/reference")
sys.path.insert(0, os.path.dirname(__file__))

from protocol import (BATCH_SIZE, CHARGE_EPOCHS, CRYSTAL_BATCH,
                      CRYSTAL_EPOCHS, EPOCHS, FORCE_LOSS_FACTOR, GCN_EPOCHS,
                      GCN_LR, HDNNP_KW, LR_START, LR_STOP, MLP_KW,
                      load_crystal, load_md)

HERE = os.path.dirname(__file__)
RESULTS = os.path.join(HERE, "results")


def _rag(vals, inner=None, dtype=None):
    import tensorflow as tf
    kw = {"ragged_rank": 1}
    if inner is not None:
        kw["inner_shape"] = inner
    if dtype is not None:
        kw["dtype"] = dtype
    return tf.ragged.constant(vals, **kw)


def md_tensors(frames, idx, model):
    import tensorflow as tf
    sel = [frames[i] for i in idx]
    z = _rag([f["z"].astype(np.float32) for f in sel])
    xyz = _rag([f["xyz"] for f in sel], inner=(3,))
    ei = _rag([f["edge_indices"] for f in sel], inner=(2,), dtype="int64")
    x = [z, xyz, ei]
    if model in ("hdnnp2nd", "hdnnp4th"):
        x.append(_rag([f["angle_indices_nodes"] for f in sel], inner=(3,),
                      dtype="int64"))
    if model == "hdnnp4th":
        x.append(tf.constant(np.stack([f["total_charge"] for f in sel])))
        x.append(_rag([f["esp"] for f in sel]))
        x.append(_rag([f["esp_grad"] for f in sel], inner=(3,)))
    energy = tf.constant(np.stack([f["energy"] for f in sel]))
    force = _rag([f["force"] for f in sel], inner=(3,))
    return x, energy, force


def build_model(model, seed):
    import tensorflow as tf
    tf.keras.utils.set_random_seed(seed)
    from kgcnn.model.force import EnergyForceModel
    if model == "schnet":
        from kgcnn.literature.Schnet import make_model
        energy = make_model(depth=2)
        eo, esp = 0, False
    elif model == "painn":
        from kgcnn.literature.PAiNN import make_model
        energy = make_model(depth=2)
        eo, esp = 0, False
    elif model == "hdnnp2nd":
        from kgcnn.literature.HDNNP2nd import make_model_behler
        energy = make_model_behler(mlp_kwargs=dict(MLP_KW), **HDNNP_KW)
        eo, esp = 0, False
    elif model == "hdnnp4th":
        from kgcnn.literature.HDNNP4th import make_model_behler
        energy = make_model_behler(
            inputs=[
                {"shape": (None,), "name": "node_number", "dtype": "int64",
                 "ragged": True},
                {"shape": (None, 3), "name": "node_coordinates",
                 "dtype": "float32", "ragged": True},
                {"shape": (None, 2), "name": "range_indices",
                 "dtype": "int64", "ragged": True},
                {"shape": (None, 3), "name": "angle_indices_nodes",
                 "dtype": "int64", "ragged": True},
                {"shape": (1,), "name": "total_charge", "dtype": "float32",
                 "ragged": False},
                {"shape": (None,), "name": "esp", "dtype": "float32",
                 "ragged": True},
                {"shape": (None, 3), "name": "esp_grad", "dtype": "float32",
                 "ragged": True}],
            mlp_charge_kwargs=dict(MLP_KW), mlp_local_kwargs=dict(MLP_KW),
            output_embedding="charge+qm_energy", **HDNNP_KW)
        eo, esp = 1, True
    else:
        raise ValueError(model)
    kw = dict(model_energy=energy, energy_output=eo, output_to_tensor=True,
              output_as_dict=False, output_squeeze_states=True,
              is_physical_force=False)
    if esp:
        kw.update(esp_input=5, esp_grad_input=6)
    return EnergyForceModel(**kw), esp


def run_md(model_name, seed):
    import tensorflow as tf
    from kgcnn.training.scheduler import LinearLearningRateScheduler

    frames, splits = load_md(os.path.join(HERE, "data", "md.npz"))
    tr_idx, va_idx = splits[seed]
    x_train, e_train, f_train = md_tensors(frames, tr_idx, model_name)
    x_val, e_val, f_val = md_tensors(frames, va_idx, model_name)

    fmodel, has_charge = build_model(model_name, seed)

    wf = 1.0 / FORCE_LOSS_FACTOR
    if has_charge:
        # reference zero_loss_function returns int 0, which this tf_keras
        # rejects in loss_value *= loss_weight — float variant instead
        def zero_loss_function(y_true, y_pred):
            return tf.constant(0.0)
        losses = [zero_loss_function, "mean_squared_error",
                  "mean_squared_error"]
        weights = [0.0, wf, 1.0 - wf]
        y_train = [tf.zeros_like(e_train), e_train, f_train]
    else:
        losses = ["mean_squared_error", "mean_squared_error"]
        weights = [wf, 1.0 - wf]
        y_train = [e_train, f_train]

    fmodel.compile(
        optimizer=tf.keras.optimizers.Adam(learning_rate=LR_START),
        loss=losses, loss_weights=weights)
    sched = LinearLearningRateScheduler(
        learning_rate_start=LR_START, learning_rate_stop=LR_STOP,
        epo_min=0, epo=EPOCHS, verbose=0)
    t0 = time.time()
    fmodel.fit(x_train, y_train, batch_size=BATCH_SIZE, epochs=EPOCHS,
               shuffle=True, verbose=0, callbacks=[sched])
    train_time = time.time() - t0

    pred = fmodel.predict(x_val, batch_size=BATCH_SIZE, verbose=0)
    e_pred, f_pred = (pred[1], pred[2]) if has_charge else (pred[0], pred[1])
    e_mae = float(np.mean(np.abs(np.asarray(e_pred).reshape(-1)
                                 - np.asarray(e_val).reshape(-1))))
    # force pred comes back padded (B, N, 3); all frames have 9 real atoms
    f_ref = np.stack([frames[i]["force"] for i in va_idx])
    f_pred = np.asarray(f_pred)[:, :f_ref.shape[1], :]
    f_mae = float(np.mean(np.abs(f_pred - f_ref)))
    return {"framework": "reference", "model": model_name, "seed": seed,
            "val_energy_mae": e_mae, "val_force_mae": f_mae,
            "train_seconds": train_time, "epochs": EPOCHS}


def run_charge(seed):
    """Charge-only HDNNP4th (mirrors /root/reference/charge_hdnnp4th.py:
    output_embedding='charge', MSE on ragged charges, Adam + linear LR)."""
    import tensorflow as tf
    from kgcnn.literature.HDNNP4th import make_model_behler
    from kgcnn.training.scheduler import LinearLearningRateScheduler

    tf.keras.utils.set_random_seed(seed)
    frames, splits = load_md(os.path.join(HERE, "data", "md.npz"))
    tr_idx, va_idx = splits[seed]
    x_train, _, _ = md_tensors(frames, tr_idx, "hdnnp4th")
    x_val, _, _ = md_tensors(frames, va_idx, "hdnnp4th")
    # every frame has 9 atoms -> dense (B, 9, 1) charge targets, plain MSE
    # exactly like the fork's charge script (charge_hdnnp4th.py:205)
    q_train = tf.constant(np.stack(
        [frames[i]["charge"].reshape(-1, 1) for i in tr_idx]))
    q_val = np.concatenate([frames[i]["charge"] for i in va_idx])

    model = make_model_behler(
        inputs=[
            {"shape": (None,), "name": "node_number", "dtype": "int64",
             "ragged": True},
            {"shape": (None, 3), "name": "node_coordinates",
             "dtype": "float32", "ragged": True},
            {"shape": (None, 2), "name": "range_indices",
             "dtype": "int64", "ragged": True},
            {"shape": (None, 3), "name": "angle_indices_nodes",
             "dtype": "int64", "ragged": True},
            {"shape": (1,), "name": "total_charge", "dtype": "float32",
             "ragged": False},
            {"shape": (None,), "name": "esp", "dtype": "float32",
             "ragged": True},
            {"shape": (None, 3), "name": "esp_grad", "dtype": "float32",
             "ragged": True}],
        mlp_charge_kwargs=dict(MLP_KW), mlp_local_kwargs=dict(MLP_KW),
        output_embedding="charge", **HDNNP_KW)
    model.compile(optimizer=tf.keras.optimizers.Adam(LR_START),
                  loss="mean_squared_error")
    sched = LinearLearningRateScheduler(
        learning_rate_start=LR_START, learning_rate_stop=LR_STOP,
        epo_min=0, epo=CHARGE_EPOCHS, verbose=0)
    t0 = time.time()
    model.fit(x_train, q_train, batch_size=BATCH_SIZE, epochs=CHARGE_EPOCHS,
              shuffle=True, verbose=0, callbacks=[sched])
    train_time = time.time() - t0
    pred = model.predict(x_val, batch_size=BATCH_SIZE, verbose=0)
    q_pred = np.asarray(pred).reshape(len(va_idx), -1)[:, :9].reshape(-1)
    q_mae = float(np.mean(np.abs(q_pred - q_val)))
    return {"framework": "reference", "model": "charge", "seed": seed,
            "val_charge_mae": q_mae, "train_seconds": train_time,
            "epochs": CHARGE_EPOCHS}


def run_crystal(seed):
    """Periodic Schnet (make_crystal_model) on precomputed periodic graphs."""
    import tensorflow as tf
    from kgcnn.literature.Schnet import make_crystal_model
    from kgcnn.training.scheduler import LinearLearningRateScheduler

    tf.keras.utils.set_random_seed(seed)
    cells, splits = load_crystal(os.path.join(HERE, "data", "crystal.npz"))
    tr_idx, va_idx = splits[seed]

    def tensors(idx):
        sel = [cells[i] for i in idx]
        z = _rag([c["z"].astype(np.float32) for c in sel])
        xyz = _rag([c["xyz"] for c in sel], inner=(3,))
        ei = _rag([c["edge_indices"] for c in sel], inner=(2,),
                  dtype="int64")
        img = _rag([c["edge_image"].astype(np.float32) for c in sel],
                   inner=(3,))
        lat = tf.constant(np.stack([c["lattice"] for c in sel]))
        y = tf.constant(np.stack([c["label"] for c in sel]))
        return [z, xyz, ei, img, lat], y

    x_train, y_train = tensors(tr_idx)
    x_val, y_val = tensors(va_idx)
    # the reference's make_crystal_model defaults to the NON-crystal inputs
    # list (Schnet.py:174 decorates with model_default), so the 5-element
    # crystal input spec must be passed explicitly
    model = make_crystal_model(depth=2, inputs=[
        {"shape": (None,), "name": "node_attributes", "dtype": "float32",
         "ragged": True},
        {"shape": (None, 3), "name": "node_coordinates", "dtype": "float32",
         "ragged": True},
        {"shape": (None, 2), "name": "edge_indices", "dtype": "int64",
         "ragged": True},
        {"shape": (None, 3), "name": "edge_image", "dtype": "float32",
         "ragged": True},
        {"shape": (3, 3), "name": "graph_lattice", "dtype": "float32",
         "ragged": False}])
    model.compile(optimizer=tf.keras.optimizers.Adam(LR_START),
                  loss="mean_squared_error")
    sched = LinearLearningRateScheduler(
        learning_rate_start=LR_START, learning_rate_stop=LR_STOP,
        epo_min=0, epo=CRYSTAL_EPOCHS, verbose=0)
    t0 = time.time()
    model.fit(x_train, y_train, batch_size=CRYSTAL_BATCH,
              epochs=CRYSTAL_EPOCHS, shuffle=True, verbose=0,
              callbacks=[sched])
    train_time = time.time() - t0
    pred = model.predict(x_val, batch_size=CRYSTAL_BATCH, verbose=0)
    mae = float(np.mean(np.abs(np.asarray(pred).reshape(-1)
                               - np.asarray(y_val).reshape(-1))))
    return {"framework": "reference", "model": "crystal_schnet",
            "seed": seed, "val_mae": mae, "train_seconds": train_time,
            "epochs": CRYSTAL_EPOCHS}


def run_gcn(seed):
    import tensorflow as tf
    tf.keras.utils.set_random_seed(seed)
    from kgcnn.literature.GCN import make_model

    d = np.load(os.path.join(HERE, "data", "cora.npz"))
    na, ei, ew = d["node_attributes"], d["edge_indices"], d["edge_weights"]
    labels = d["node_labels"]
    n, c = len(labels), int(d["num_classes"])
    tm = d[f"split{seed}_train_mask"]
    vm = d[f"split{seed}_val_mask"]

    x = [_rag([na]), _rag([ew.reshape(-1, 1)], inner=(1,)),
         _rag([ei], inner=(2,), dtype="int64")]
    onehot = np.eye(c, dtype=np.float32)[labels]
    y = tf.constant(onehot[None])

    model = make_model(
        inputs=[{"shape": [None, na.shape[1]], "name": "node_attributes",
                 "dtype": "float32", "ragged": True},
                {"shape": [None, 1], "name": "edge_weights",
                 "dtype": "float32", "ragged": True},
                {"shape": [None, 2], "name": "edge_indices", "dtype": "int64",
                 "ragged": True}],
        input_embedding={"node": {"input_dim": 95, "output_dim": 64}},
        gcn_args={"units": 64, "use_bias": True, "activation": "relu"},
        depth=3, output_embedding="node",
        output_mlp={"use_bias": [True, True, False], "units": [64, 32, c],
                    "activation": ["relu", "relu", "softmax"]})
    model.compile(optimizer=tf.keras.optimizers.Adam(GCN_LR),
                  loss="categorical_crossentropy", weighted_metrics=["categorical_accuracy"])
    sw = tf.constant(tm.astype(np.float32)[None])
    t0 = time.time()
    model.fit(x, y, sample_weight=sw, batch_size=1, epochs=GCN_EPOCHS,
              verbose=0)
    train_time = time.time() - t0
    pred = np.asarray(model.predict(x, verbose=0))[0]
    acc = float((pred[vm].argmax(-1) == labels[vm]).mean())
    return {"framework": "reference", "model": "gcn", "seed": seed,
            "val_accuracy": acc, "train_seconds": train_time,
            "epochs": GCN_EPOCHS}


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True,
                    choices=["schnet", "painn", "hdnnp2nd", "hdnnp4th",
                             "gcn", "charge", "crystal_schnet"])
    ap.add_argument("--seed", type=int, required=True)
    ap.add_argument("--epochs", type=int, default=None,
                    help="override epoch count (timing smoke only)")
    args = ap.parse_args()
    if args.epochs:
        import protocol
        protocol.EPOCHS = EPOCHS = args.epochs
        protocol.GCN_EPOCHS = GCN_EPOCHS = args.epochs
        protocol.CHARGE_EPOCHS = CHARGE_EPOCHS = args.epochs
        protocol.CRYSTAL_EPOCHS = CRYSTAL_EPOCHS = args.epochs

    import tensorflow as tf
    tf.config.set_visible_devices([], "GPU")

    os.makedirs(RESULTS, exist_ok=True)
    runners = {"gcn": run_gcn, "charge": run_charge,
               "crystal_schnet": run_crystal}
    if args.model in runners:
        res = runners[args.model](args.seed)
    else:
        res = run_md(args.model, args.seed)
    out = os.path.join(RESULTS, f"ref_{args.model}_s{args.seed}.json")
    with open(out, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res))
