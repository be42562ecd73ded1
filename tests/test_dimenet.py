import numpy as np
import jax
import pytest

from gcnn_keras_tpu.batch import batch_graphs
from gcnn_keras_tpu.graph.preprocess import set_range, set_angle_edge_pairs


def test_dimenet_pp_forward_and_padding_invariance():
    from gcnn_keras_tpu.models.dimenet_pp import make_model
    rs = np.random.RandomState(0)
    graphs = []
    for _ in range(2):
        n = rs.randint(4, 6)
        g = {"node_number": rs.choice([1, 6, 8], size=n),
             "node_coordinates": (rs.randn(n, 3) * 1.5).astype(np.float32)}
        g = set_range(g, max_distance=5.0, max_neighbours=8)
        g["edge_indices"] = g["range_indices"]
        g = set_angle_edge_pairs(g)
        graphs.append(g)
    model = make_model(emb_size=16, out_emb_size=16, int_emb_size=8,
                       basis_emb_size=4, num_blocks=1, num_spherical=4,
                       num_radial=4)
    b1 = batch_graphs(graphs, n_node_pad=16, n_edge_pad=128, n_angle_edge_pad=512)
    params = model.init(jax.random.PRNGKey(0), b1)
    o1 = model.apply(params, b1)["output"]
    assert o1.shape == (3, 1)
    assert np.isfinite(np.asarray(o1)).all()

    b2 = batch_graphs(graphs, n_node_pad=32, n_edge_pad=256,
                      n_angle_edge_pad=1024, n_graph_pad=5)
    o2 = model.apply(params, b2)["output"]
    assert np.allclose(np.asarray(o1)[:2], np.asarray(o2)[:2], atol=1e-4)


def test_sbf_vs_reference_formula():
    """Spherical basis against direct scipy evaluation."""
    from gcnn_keras_tpu.models.dimenet_pp import SphericalBasisLayer
    from scipy.special import spherical_jn
    import jax.numpy as jnp
    layer = SphericalBasisLayer(num_spherical=3, num_radial=3, cutoff=5.0)
    d = jnp.asarray([1.0, 2.5, 4.0])
    cos_a = jnp.asarray([0.5, -0.2, 0.9])
    out = np.asarray(layer.apply({}, d, cos_a))
    assert out.shape == (3, 9)
    assert np.isfinite(out).all()
    # check one entry (l=0, n=0): j_0(z00 * d/c) * norm * Y_0 * env with the
    # reference's 1/u envelope (dimenet_conv.py envelope()) and the m=0
    # spherical-harmonics scale sqrt(1/4pi)
    from gcnn_keras_tpu.models.dimenet_pp import _sbf_constants
    zeros, norms = _sbf_constants(3, 3)
    rho = np.asarray(d) / 5.0
    pe = 6
    a, b, c = -(pe + 1) * (pe + 2) / 2.0, pe * (pe + 2), -pe * (pe + 1) / 2.0
    env = 1.0 / rho + a * rho ** (pe - 1) + b * rho ** pe + c * rho ** (pe + 1)
    y0 = np.sqrt(1.0 / (4.0 * np.pi))
    expect = spherical_jn(0, zeros[0, 0] * rho) * norms[0, 0] * y0 * env
    assert np.allclose(out[:, 0], expect, atol=1e-4)
