import numpy as np
import jax
import pytest

from gcnn_keras_tpu.utils.checkpoint import save_checkpoint, load_checkpoint
from tests.test_model_zoo import make_mol_batch


def test_checkpoint_roundtrip_predictions(tmp_path):
    from gcnn_keras_tpu.models.schnet import make_model
    import optax
    model = make_model(depth=1, interaction_args={"units": 16},
                       gauss_args={"bins": 8, "distance_max": 5.0},
                       last_mlp={"units": [16], "activation": ["shifted_softplus"]},
                       output_mlp={"units": [1], "activation": ["linear"]})
    b = make_mol_batch()
    params = model.init(jax.random.PRNGKey(0), b)
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    out1 = np.asarray(model.apply(params, b)["output"])

    path = save_checkpoint(str(tmp_path / "ckpt"), params,
                           opt_state=opt_state, step=7)
    assert "step_7" in path

    restored = load_checkpoint(str(tmp_path / "ckpt"))
    out2 = np.asarray(model.apply(restored["params"], b)["output"])
    assert np.allclose(out1, out2)
    # optimizer state restored too (improves on reference SavedModel-only)
    assert "opt_state" in restored


def test_checkpoint_latest_selection(tmp_path):
    params = {"w": np.ones(3)}
    save_checkpoint(str(tmp_path / "c"), params, step=1)
    save_checkpoint(str(tmp_path / "c"), {"w": np.ones(3) * 2}, step=5)
    restored = load_checkpoint(str(tmp_path / "c"))
    assert np.allclose(restored["params"]["w"], 2)
