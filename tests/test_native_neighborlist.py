"""Native C++ cell-list neighbor search vs the numpy reference path."""
import numpy as np
import pytest

from gcnn_keras_tpu import native
from gcnn_keras_tpu.graph.preprocess import set_range

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library not built")


def _canon(pairs, dist):
    order = np.lexsort((pairs[:, 1], pairs[:, 0]))
    return pairs[order], dist[order]


@pytest.mark.parametrize("n,cutoff,k", [(50, 2.5, 50), (300, 2.0, 12),
                                        (1200, 1.5, 25)])
def test_matches_numpy_path(n, cutoff, k):
    rs = np.random.RandomState(n)
    xyz = (rs.rand(n, 3) * (n / 20.0) ** (1 / 3) * 3).astype(np.float64)
    g = {"node_coordinates": xyz}
    ref = set_range(dict(g), max_distance=cutoff, max_neighbours=k,
                    backend="numpy")
    nat = set_range(dict(g), max_distance=cutoff, max_neighbours=k,
                    backend="native")
    rp, rd = _canon(ref["range_indices"], ref["range_attributes"][:, 0])
    np_, nd = _canon(nat["range_indices"], nat["range_attributes"][:, 0])
    assert rp.shape == np_.shape, (rp.shape, np_.shape)
    np.testing.assert_array_equal(rp, np_)
    np.testing.assert_allclose(rd, nd, rtol=1e-6)


def test_cap_keeps_closest():
    rs = np.random.RandomState(7)
    xyz = rs.rand(400, 3) * 4.0
    g = {"node_coordinates": xyz}
    ref = set_range(dict(g), max_distance=3.0, max_neighbours=5,
                    backend="numpy")
    nat = set_range(dict(g), max_distance=3.0, max_neighbours=5,
                    backend="native")
    # per-receiver distance SETS must match even if tie-order differs
    for arrs in (ref, nat):
        assert (np.bincount(arrs["range_indices"][:, 0],
                            minlength=400) <= 5).all()
    rd = np.sort(ref["range_attributes"][:, 0])
    nd = np.sort(nat["range_attributes"][:, 0])
    np.testing.assert_allclose(rd, nd, rtol=1e-6)


def test_auto_dispatch_large_system():
    rs = np.random.RandomState(3)
    xyz = rs.rand(600, 3) * 10.0
    out = set_range({"node_coordinates": xyz}, max_distance=2.0,
                    max_neighbours=20)  # auto -> native at n >= 256
    assert out["range_indices"].shape[1] == 2
    assert np.isfinite(out["range_attributes"]).all()


def test_invert_distance():
    rs = np.random.RandomState(5)
    xyz = rs.rand(300, 3) * 5.0
    a = set_range({"node_coordinates": xyz}, max_distance=2.5,
                  max_neighbours=10, do_invert_distance=True,
                  backend="native")
    b = set_range({"node_coordinates": xyz}, max_distance=2.5,
                  max_neighbours=10, do_invert_distance=True,
                  backend="numpy")
    np.testing.assert_allclose(np.sort(a["range_attributes"][:, 0]),
                               np.sort(b["range_attributes"][:, 0]),
                               rtol=1e-5)
