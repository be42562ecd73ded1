"""The training/hyper/ config library: every file loads, every model config
builds, and representative configs run a forward pass on archetype batches
(parity: reference ``training/hyper/hyper_*.py`` per-dataset configs)."""
import glob
import os

import numpy as np
import pytest

import jax

from gcnn_keras_tpu.batch import batch_graphs
from gcnn_keras_tpu.graph.preprocess import set_range, set_angle
from gcnn_keras_tpu.training.hyper import HyperParameter

HYPER_DIR = os.path.join(os.path.dirname(__file__), "..", "training", "hyper")
HYPER_FILES = sorted(glob.glob(os.path.join(HYPER_DIR, "hyper_*.py")))


def _load(path):
    import importlib.util
    spec = importlib.util.spec_from_file_location("hyper_config", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.hyper


def test_library_is_complete():
    names = {os.path.basename(p) for p in HYPER_FILES}
    expected = {
        "hyper_clintox.py", "hyper_cora.py", "hyper_cora_lu.py",
        "hyper_esol.py", "hyper_freesolv.py", "hyper_iso17.py",
        "hyper_lipop.py", "hyper_md17.py", "hyper_md17_revised.py",
        "hyper_mp_dielectric.py", "hyper_mp_e_form.py", "hyper_mp_gap.py",
        "hyper_mp_is_metal.py", "hyper_mp_jdft2d.py", "hyper_mp_log_gvrh.py",
        "hyper_mp_log_kvrh.py", "hyper_mp_perovskites.py",
        "hyper_mp_phonons.py", "hyper_mutag.py", "hyper_mutagenicity.py",
        "hyper_proteins.py", "hyper_qm7.py", "hyper_qm7b.py",
        "hyper_qm9_energies.py", "hyper_qm9_orbitals.py", "hyper_sider.py",
        "hyper_tox21mol.py", "hyper_vgd_mock.py", "hyper_vgd_rb_motifs.py",
    }
    assert expected <= names  # the reference's 29 per-dataset files


@pytest.mark.parametrize("path", HYPER_FILES, ids=os.path.basename)
def test_every_model_config_builds(path):
    hyper_all = _load(path)
    assert isinstance(hyper_all, dict) and hyper_all
    for model_key in hyper_all:
        hp = HyperParameter(hyper_all, model_name=model_key)
        assert "model" in hp and "data" in hp and "training" in hp
        model = hp.make_model()
        assert model is not None, f"{path}:{model_key}"
        opt = hp.make_optimizer()
        assert opt is not None
        ds_cfg = hp["data"]["dataset"]
        assert "class_name" in ds_cfg


# --- forward-pass smoke on archetype batches --------------------------------

def _make_batch(style):
    rs = np.random.RandomState(0)
    graphs = []
    for _ in range(2):
        n = rs.randint(6, 10)
        ei = np.array([[i, (i + 1) % n] for i in range(n)]
                      + [[(i + 1) % n, i] for i in range(n)], dtype=np.int64)
        g = {"node_number": rs.choice([1, 6, 7, 8], size=n),
             "node_coordinates": rs.randn(n, 3).astype(np.float32) * 2,
             "edge_indices": ei}
        if style == "molnet":
            g["node_attributes"] = rs.randn(n, 41).astype(np.float32)
            g["edge_attributes"] = rs.randn(len(ei), 11).astype(np.float32)
        g = set_range(g, max_distance=4.0, max_neighbours=8)
        g = set_angle(g)
        if style == "qm":
            g["edge_indices"] = g["range_indices"]
        graphs.append(g)
    return batch_graphs(graphs)


@pytest.mark.parametrize("model_key,fname,style", [
    ("GIN", "hyper_esol.py", "molnet"),
    ("Schnet", "hyper_qm7.py", "qm"),
    ("HDNNP2nd", "hyper_qm7.py", "qm"),
    ("PAiNN.EnergyForceModel", "hyper_md17.py", "qm"),
    ("MEGAN", "hyper_vgd_mock.py", "molnet"),
])
def test_representative_forward(model_key, fname, style):
    hyper_all = _load(os.path.join(HYPER_DIR, fname))
    hp = HyperParameter(hyper_all, model_name=model_key)
    model = hp.make_model()
    batch = _make_batch(style)
    params = model.init(jax.random.PRNGKey(0), batch)
    out = model.apply(params, batch)
    key = "output" if "output" in out else list(out)[0]
    assert np.all(np.isfinite(np.asarray(out[key])))
