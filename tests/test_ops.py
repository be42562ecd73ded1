import numpy as np
import jax
import jax.numpy as jnp
from scipy.special import spherical_jn
from numpy.polynomial import legendre as np_leg

from gcnn_keras_tpu.ops import (
    segment_sum, segment_mean, segment_max, segment_min, segment_softmax,
    segment_ops_by_name, get_activation, spherical_bessel_jn_all,
    legendre_pn_all, glorot_orthogonal,
)


def test_segment_reductions_vs_numpy():
    rs = np.random.RandomState(0)
    data = rs.randn(20, 5).astype(np.float32)
    seg = np.sort(rs.randint(0, 6, size=20)).astype(np.int32)
    for name, npop in [("sum", np.sum), ("mean", np.mean), ("max", np.max), ("min", np.min)]:
        out = np.asarray(segment_ops_by_name(name, jnp.asarray(data), jnp.asarray(seg), 8))
        for s in range(8):
            rows = data[seg == s]
            expect = npop(rows, axis=0) if len(rows) else np.zeros(5)
            assert np.allclose(out[s], expect, atol=1e-5), (name, s)


def test_segment_softmax():
    data = jnp.asarray([[1.0], [2.0], [3.0], [10.0]])
    seg = jnp.asarray([0, 0, 0, 1])
    out = np.asarray(segment_softmax(data, seg, 3))
    e = np.exp([1, 2, 3])
    assert np.allclose(out[:3, 0], e / e.sum(), atol=1e-6)
    assert np.allclose(out[3, 0], 1.0)


def test_segment_softmax_masked():
    data = jnp.asarray([[1.0], [2.0], [99.0]])
    seg = jnp.asarray([0, 0, 0])
    mask = jnp.asarray([True, True, False])
    out = np.asarray(segment_softmax(data, seg, 1, mask=mask))
    e = np.exp([1, 2])
    assert np.allclose(out[:2, 0], e / e.sum(), atol=1e-6)
    assert out[2, 0] == 0


def test_activations():
    x = jnp.linspace(-3, 3, 7)
    ssp = get_activation("shifted_softplus")
    assert np.allclose(float(ssp(jnp.asarray(0.0))), 0.0, atol=1e-7)
    ls = get_activation("kgcnn>leaky_softplus")
    expect = 0.05 * np.asarray(x) + 0.95 * np.log1p(np.exp(np.asarray(x)))
    assert np.allclose(np.asarray(ls(x)), expect, atol=1e-5)


def test_spherical_bessel_vs_scipy():
    x = np.linspace(0.01, 20, 50)
    ours = np.asarray(spherical_bessel_jn_all(jnp.asarray(x), 5))
    for l in range(5):
        assert np.allclose(ours[:, l], spherical_jn(l, x), atol=1e-4), l


def test_legendre_vs_numpy():
    x = np.linspace(-1, 1, 21)
    ours = np.asarray(legendre_pn_all(jnp.asarray(x), 6))
    for n in range(6):
        c = np.zeros(n + 1); c[n] = 1
        assert np.allclose(ours[:, n], np_leg.legval(x, c), atol=1e-5), n


def test_glorot_orthogonal():
    init = glorot_orthogonal()
    w = init(jax.random.PRNGKey(0), (64, 32))
    var = float(jnp.var(w))
    assert abs(var - 2.0 / 96) < 1e-4
