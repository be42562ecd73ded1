import numpy as np
import jax
import jax.numpy as jnp

from gcnn_keras_tpu.graph.preprocess import get_preprocessor
from gcnn_keras_tpu.moldyn.base import (
    MolDynamicsModelPredictor, ExtensiveEnergyForceScalerPostprocessor,
)


def _small_potential():
    from gcnn_keras_tpu.models.schnet import make_model
    from gcnn_keras_tpu.model.force import EnergyForceModel
    model = make_model(depth=1, interaction_args={"units": 16},
                       gauss_args={"bins": 8, "distance_max": 5.0},
                       last_mlp={"units": [16], "activation": ["shifted_softplus"]},
                       output_mlp={"units": [1], "activation": ["linear"]})
    return EnergyForceModel(model)


class _Apply:
    def __init__(self, fmodel):
        self.fmodel = fmodel

    def apply(self, variables, batch, **kw):
        return self.fmodel.apply(variables, batch)


def _frames(n_frames=2, n=5, seed=0):
    rs = np.random.RandomState(seed)
    return [{"node_number": rs.choice([1, 6, 8], size=n),
             "node_coordinates": (rs.randn(n, 3) * 1.5).astype(np.float32)}
            for _ in range(n_frames)]


def test_moldyn_predictor_pipeline():
    fmodel = _small_potential()
    frames = _frames()
    pre = get_preprocessor("set_range", max_distance=5.0, max_neighbours=10)
    # init params via one preprocessed batch
    from gcnn_keras_tpu.batch import batch_graphs
    g0 = dict(frames[0]); g0.update(pre(g0)); g0["edge_indices"] = g0["range_indices"]
    params = fmodel.init(jax.random.PRNGKey(0), batch_graphs([g0]))

    predictor = MolDynamicsModelPredictor(
        model=_Apply(fmodel), variables=params, graph_preprocessors=[pre])
    out = predictor(frames)
    assert len(out) == 2
    for r, f in zip(out, frames):
        assert r["force"].shape == (len(f["node_number"]), 3)
        assert np.isfinite(r["energy"]).all()
        # translation invariance of predicted forces
        assert np.abs(r["force"].sum(axis=0)).max() < 1e-3


def test_moldyn_bucketing_stable_shapes():
    """Pads bucket: small coordinate changes should reuse compiled shapes."""
    fmodel = _small_potential()
    frames = _frames()
    pre = get_preprocessor("set_range", max_distance=5.0, max_neighbours=10)
    from gcnn_keras_tpu.batch import batch_graphs
    g0 = dict(frames[0]); g0.update(pre(g0)); g0["edge_indices"] = g0["range_indices"]
    params = fmodel.init(jax.random.PRNGKey(0), batch_graphs([g0]))
    predictor = MolDynamicsModelPredictor(
        model=_Apply(fmodel), variables=params, graph_preprocessors=[pre])
    rs = np.random.RandomState(1)
    for _ in range(3):
        f = dict(frames[0])
        f["node_coordinates"] = f["node_coordinates"] + \
            rs.randn(*f["node_coordinates"].shape).astype(np.float32) * 0.05
        out = predictor([f])
        assert np.isfinite(out[0]["energy"]).all()


def test_scaler_postprocessor():
    from gcnn_keras_tpu.data.scalers import EnergyForceExtensiveLabelScaler
    from gcnn_keras_tpu.data.datasets.synthetic import SyntheticMDDataset
    ds = SyntheticMDDataset(num_frames=8)
    sc = EnergyForceExtensiveLabelScaler()
    sc.fit_dataset(ds)
    post = ExtensiveEnergyForceScalerPostprocessor(sc)
    g = dict(ds[0])
    res = {"energy": np.array([0.0]), "force": np.zeros((len(g["node_number"]), 3))}
    out = post(res, g)
    # zero scaled energy should invert to the composition baseline
    z = [np.asarray(g["node_number"])]
    expect = sc.inverse_transform(np.array([0.0]), z)
    assert np.allclose(out["energy"], expect)


def test_mlmm_wrapper_adds_qmmm_terms():
    from gcnn_keras_tpu.model.mlmm import MLMMEnergyForceModel
    from gcnn_keras_tpu.models.hdnnp4th import make_model_behler
    from gcnn_keras_tpu.model.force import EnergyForceModel
    from gcnn_keras_tpu.batch import batch_graphs
    from gcnn_keras_tpu.graph.preprocess import set_range, set_angle

    rs = np.random.RandomState(0)
    n = 4
    g = {"node_number": rs.choice([1, 6, 16], size=n),
         "node_coordinates": (rs.randn(n, 3) * 1.2).astype(np.float32),
         "total_charge": np.array([0.0], dtype=np.float32),
         "esp": (rs.randn(n) * 0.1).astype(np.float32),
         "esp_grad": (rs.randn(n, 3) * 0.1).astype(np.float32)}
    g = set_range(g, max_distance=6.0, max_neighbours=6)
    g["edge_indices"] = g["range_indices"]
    g = set_angle(g, range_indices="edge_indices")
    b = batch_graphs([g], global_keys=("total_charge",))

    inner = EnergyForceModel(make_model_behler(
        mlp_charge_kwargs={"units": [8, 1], "num_relations": 17,
                           "activation": ["swish", "linear"]},
        mlp_local_kwargs={"units": [8, 1], "num_relations": 17,
                          "activation": ["swish", "linear"]}))
    wrapper = MLMMEnergyForceModel(inner)
    params = wrapper.init(jax.random.PRNGKey(0), b, train=False)
    out_in = inner.apply(params, b, train=False)
    out_ml = wrapper.apply(params, b, train=False)
    # energy shifted by the qmmm correction, forces modified
    assert not np.allclose(np.asarray(out_in["energy"])[0],
                           np.asarray(out_ml["energy"])[0])
    assert "qmmm_energy_correction" in out_ml
