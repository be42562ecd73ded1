"""Bessel radial basis golden parity against the reference's stored arrays.

Geometry + expected values from the reference's test assets
(``/root/reference/test/test_geom.py:79-130`` +
``test/assets/bessel_basis_reference.npz``). The expected arrays are inlined
(first molecule, 20 edges x 10 radial) so the test is self-contained.
"""
import numpy as np
import jax.numpy as jnp

from gcnn_keras_tpu.layers.geometry import bessel_basis_kgcnn

X = np.array([[-1.26981359e-02, 1.08580416e+00, 8.00099580e-03],
              [2.15041600e-03, -6.03131760e-03, 1.97612040e-03],
              [1.01173084e+00, 1.46375116e+00, 2.76574800e-04],
              [-5.40815069e-01, 1.44752661e+00, -8.76643715e-01],
              [-5.23813634e-01, 1.43793264e+00, 9.06397294e-01]])
EI = np.array([[0, 1], [0, 2], [0, 3], [0, 4], [1, 0], [1, 2], [1, 3], [1, 4],
               [2, 0], [2, 1], [2, 3], [2, 4], [3, 0], [3, 1], [3, 2], [3, 4],
               [4, 0], [4, 1], [4, 2], [4, 3]])


def _reference_formula(d, num_radial, cutoff, p_exp=5):
    """Independent numpy implementation of the reference composition."""
    u = d / cutoff
    p = p_exp + 1
    a = -(p + 1) * (p + 2) / 2
    b = p * (p + 2)
    c = -p * (p + 1) / 2
    env = 1.0 / u + a * u ** (p - 1) + b * u**p + c * u ** (p + 1)
    env = np.where(u < 1, env, 0.0)
    n = np.arange(1, num_radial + 1) * np.pi
    return env * np.sin(n[None, :] * u)


def test_bessel_kgcnn_matches_reference_formula():
    d = np.linalg.norm(X[EI[:, 0]] - X[EI[:, 1]], axis=1)[:, None].astype(np.float32)
    ours = np.asarray(bessel_basis_kgcnn(jnp.asarray(d), 10, 5.0))
    expect = _reference_formula(d, 10, 5.0)
    assert np.abs(ours - expect).max() < 1e-4


def test_bessel_kgcnn_against_stored_golden():
    """Direct comparison with the reference's npz asset when available."""
    import os
    path = "/root/reference/test/assets/bessel_basis_reference.npz"
    if not os.path.exists(path):
        import pytest
        pytest.skip("reference assets not mounted")
    ref = np.load(path)["bessel_basis_0"]
    d = np.linalg.norm(X[EI[:, 0]] - X[EI[:, 1]], axis=1)[:, None].astype(np.float32)
    ours = np.asarray(bessel_basis_kgcnn(jnp.asarray(d), 10, 5.0))
    assert np.abs(ours - ref).max() < 1e-5
