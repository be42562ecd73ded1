"""Native C++ cell-list neighbor search vs the numpy reference path."""
import numpy as np
import pytest

from gcnn_keras_tpu import native
from gcnn_keras_tpu.graph.preprocess import set_range, set_range_periodic

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


def _canon_periodic(out):
    p, im, d = (out["range_indices"], out["range_image"],
                out["range_attributes"][:, 0])
    order = np.lexsort((im[:, 2], im[:, 1], im[:, 0], p[:, 1], p[:, 0]))
    return p[order], im[order], d[order]


@pytest.mark.parametrize("n,cutoff", [(20, 3.0), (60, 4.5), (250, 2.5)])
def test_periodic_matches_numpy_path(n, cutoff):
    rs = np.random.RandomState(n)
    lat = np.diag([8.0, 9.0, 10.0]) + rs.rand(3, 3) * 0.5  # triclinic
    frac = rs.rand(n, 3)
    g = {"node_coordinates": frac @ lat, "graph_lattice": lat}
    ref = set_range_periodic(dict(g), max_distance=cutoff, backend="numpy")
    nat = set_range_periodic(dict(g), max_distance=cutoff, backend="native")
    rp, ri, rd = _canon_periodic(ref)
    np_, ni, nd = _canon_periodic(nat)
    assert rp.shape == np_.shape, (rp.shape, np_.shape)
    np.testing.assert_array_equal(rp, np_)
    np.testing.assert_array_equal(ri, ni)
    np.testing.assert_allclose(rd, nd, rtol=1e-6)


def test_periodic_capped_keeps_closest():
    rs = np.random.RandomState(11)
    lat = np.diag([7.0, 7.0, 7.0])
    g = {"node_coordinates": rs.rand(80, 3) @ lat, "graph_lattice": lat}
    ref = set_range_periodic(dict(g), max_distance=5.0, max_neighbours=8,
                             backend="numpy")
    nat = set_range_periodic(dict(g), max_distance=5.0, max_neighbours=8,
                             backend="native")
    for out in (ref, nat):
        assert (np.bincount(out["range_indices"][:, 0],
                            minlength=80) <= 8).all()
    # per-receiver distance multisets must agree even if tie-order differs
    for r in range(80):
        rd = np.sort(ref["range_attributes"][ref["range_indices"][:, 0] == r, 0])
        nd = np.sort(nat["range_attributes"][nat["range_indices"][:, 0] == r, 0])
        np.testing.assert_allclose(rd, nd, rtol=1e-6)


def test_periodic_small_cell_many_images():
    # cell much smaller than the cutoff -> long image range, self-images kept
    lat = np.diag([2.0, 2.0, 2.0])
    g = {"node_coordinates": np.array([[0.5, 0.5, 0.5], [1.2, 0.7, 0.3]]),
         "graph_lattice": lat}
    ref = set_range_periodic(dict(g), max_distance=4.2, backend="numpy")
    nat = set_range_periodic(dict(g), max_distance=4.2, backend="native")
    rp, ri, rd = _canon_periodic(ref)
    np_, ni, nd = _canon_periodic(nat)
    np.testing.assert_array_equal(rp, np_)
    np.testing.assert_array_equal(ri, ni)
    np.testing.assert_allclose(rd, nd, rtol=1e-6)
    # self pairs via non-central images must be present
    self_pairs = np_[np_[:, 0] == np_[:, 1]]
    assert len(self_pairs) > 0


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
