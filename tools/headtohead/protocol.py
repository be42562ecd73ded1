"""Shared head-to-head protocol constants (VERDICT round-1 item 2).

Both runners (``run_reference.py`` on the reference TF/kgcnn stack,
``run_ours.py`` on this framework) consume ``data/md.npz`` / ``data/cora.npz``
verbatim and train with THESE constants, so the only things that differ are
the framework and its weight initialization. Protocol mirrors the fork's
``/root/reference/force_schnet.py``: MSE energy+force losses with weights
``[1/F, 1-1/F]`` (F = force_loss_factor, ``force_schnet.py:199-203``),
Adam with the fork's per-epoch linear LR schedule
(``kgcnn/training/scheduler.py`` LinearLearningRateScheduler), batch 16.

Model configs are the exact parity-tested ones from
``tools/record_force_goldens.py`` (golden parity proven in
tests/test_force_parity.py), so both sides compute the same function
family up to initialization.
"""

SEEDS = (0, 1, 2)
EPOCHS = 100
BATCH_SIZE = 16
LR_START = 1e-3
LR_STOP = 1e-8
FORCE_LOSS_FACTOR = 200.0  # loss_weights = [1/F, 1 - 1/F]

ELEMENTS = [1, 6, 8]

HDNNP_KW = dict(
    g2_kwargs={"eta": [0.0, 0.3], "rs": [0.0, 3.0], "rc": 10.0,
               "elements": ELEMENTS},
    g4_kwargs={"eta": [0.0, 0.3], "lamda": [-1.0, 1.0], "rc": 6.0,
               "zeta": [1.0, 8.0], "elements": ELEMENTS,
               "multiplicity": 2.0},
    normalize_kwargs={},
)
MLP_KW = {"units": [32, 32, 1], "num_relations": 9,
          "activation": ["swish", "swish", "linear"]}

MD_MODELS = ("schnet", "painn", "hdnnp2nd", "hdnnp4th")

# GCN / citation protocol (mirrors /root/reference/training/train_citation.py)
GCN_EPOCHS = 200
GCN_LR = 1e-3
# r3: >=5 seeds for the GCN row (VERDICT r2 item 9)
GCN_SEEDS = tuple(range(8))

# charge-only protocol (mirrors /root/reference/charge_hdnnp4th.py:205:
# HDNNP4th output_embedding="charge", MSE loss on ragged charges, Adam +
# the same linear LR schedule)
CHARGE_EPOCHS = EPOCHS

# crystal protocol: periodic Schnet (make_crystal_model) on precomputed
# periodic graphs (data/crystal.npz), MSE graph-label loss, same schedule
CRYSTAL_EPOCHS = EPOCHS
CRYSTAL_BATCH = 16


def linear_lr(epoch: int, epochs: int = EPOCHS,
              start: float = LR_START, stop: float = LR_STOP) -> float:
    """EXACT reference LinearLearningRateScheduler.schedule_epoch_lr with
    epo_min=0 (kgcnn/training/scheduler.py:276-293), incl. the 1e-8 floor."""
    out = start - (start - stop) / epochs * epoch
    return max(float(out), 1e-8)


def load_md(path):
    import numpy as np
    d = np.load(path)
    n = int(d["n_frames"])
    frames = []
    keys = ("z", "xyz", "edge_indices", "angle_indices_nodes", "force",
            "esp", "esp_grad", "total_charge", "energy")
    for i in range(n):
        frames.append({s: d[f"f{i}_{s}"] for s in keys})
        if f"f{i}_charge" in d:
            frames[-1]["charge"] = d[f"f{i}_charge"]
    splits = {s: (d[f"split{s}_train"], d[f"split{s}_val"])
              for s in SEEDS}
    return frames, splits


def load_crystal(path):
    import numpy as np
    d = np.load(path)
    n = int(d["n_cells"])
    keys = ("z", "xyz", "lattice", "edge_indices", "edge_image", "label")
    cells = [{s: d[f"c{i}_{s}"] for s in keys} for i in range(n)]
    splits = {}
    s = 0
    while f"split{s}_train" in d:
        splits[s] = (d[f"split{s}_train"], d[f"split{s}_val"])
        s += 1
    return cells, splits
