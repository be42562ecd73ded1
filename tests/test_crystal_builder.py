"""Crystal graph builders (VERDICT r1 item 8): voronoi bonds, supercell
graphs, asymmetric-unit graphs and hashable CrystalPreprocessor configs
(reference ``kgcnn/crystal/graph_builder.py:142,311,341``,
``crystal/base.py:12``). The reference itself cannot execute in this
environment (pymatgen/pyxtal not installed), so parity is established
against exact crystallographic ground truth: Voronoi coordination numbers
of the cubic lattices (SC=6, BCC=8+6, FCC=12) and structural invariants
(symmetry of the edge set, supercell edge mapping)."""
import numpy as np
import pytest

from gcnn_keras_tpu.crystal.graph_builder import (
    CrystalPreprocessor, KNNUnitCell, RadiusUnitCell, RadiusSuperCell,
    VoronoiUnitCell, add_radius_bonds, add_voronoi_bonds,
    remove_duplicate_edges, structure_to_graph, symmetrize_graph,
    to_asymmetric_unit_graph, to_supercell_graph, add_edge_information)


def _cubic(a=3.0):
    return {"graph_lattice": np.eye(3) * a,
            "frac_coords": np.zeros((1, 3)),
            "atomic_numbers": np.array([26])}


def _bcc(a=3.0):
    return {"graph_lattice": np.eye(3) * a,
            "frac_coords": np.array([[0, 0, 0], [0.5, 0.5, 0.5]]),
            "atomic_numbers": np.array([26, 26])}


def _fcc(a=3.6):
    return {"graph_lattice": np.eye(3) * a,
            "frac_coords": np.array([[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5],
                                     [0, 0.5, 0.5]]),
            "atomic_numbers": np.array([29] * 4)}


def test_voronoi_simple_cubic_coordination():
    g = add_voronoi_bonds(structure_to_graph(_cubic()))
    ei = g["range_indices"]
    # SC Voronoi cell is a cube: 6 face neighbors
    assert len(ei) == 6
    assert np.all(ei == 0)  # single atom, all edges self-image
    # images are the 6 unit offsets
    imgs = set(map(tuple, g["range_image"]))
    assert imgs == {(1, 0, 0), (-1, 0, 0), (0, 1, 0), (0, -1, 0),
                    (0, 0, 1), (0, 0, -1)}
    np.testing.assert_allclose(g["range_attributes"][:, 0], 3.0, rtol=1e-6)


def test_voronoi_bcc_coordination():
    g = add_voronoi_bonds(structure_to_graph(_bcc()))
    ei = g["range_indices"]
    # truncated octahedron: 8 hexagonal + 6 square faces per atom
    counts = np.bincount(ei[:, 0], minlength=2)
    assert tuple(counts) == (14, 14)


def test_voronoi_fcc_coordination():
    g = add_voronoi_bonds(structure_to_graph(_fcc()))
    ei = g["range_indices"]
    counts = np.bincount(ei[:, 0], minlength=4)
    # rhombic dodecahedron: 12 neighbors each
    assert np.all(counts == 12)
    np.testing.assert_allclose(g["range_attributes"][:, 0],
                               3.6 / np.sqrt(2), rtol=1e-6)


def test_voronoi_edge_set_symmetric():
    rs = np.random.RandomState(0)
    g = {"graph_lattice": np.eye(3) * 5 + rs.randn(3, 3) * 0.1,
         "frac_coords": rs.rand(5, 3),
         "atomic_numbers": np.array([6, 8, 1, 1, 14])}
    out = add_voronoi_bonds(structure_to_graph(g))
    edges = {(int(r), int(s), *map(int, im))
             for (r, s), im in zip(out["range_indices"], out["range_image"])}
    for (r, s, i1, i2, i3) in edges:
        assert (s, r, -i1, -i2, -i3) in edges


def test_remove_duplicate_edges():
    g = add_voronoi_bonds(structure_to_graph(_cubic()))
    doubled = dict(g)
    doubled["range_indices"] = np.concatenate([g["range_indices"]] * 2)
    doubled["range_image"] = np.concatenate([g["range_image"]] * 2)
    doubled["range_attributes"] = np.concatenate([g["range_attributes"]] * 2)
    dedup = remove_duplicate_edges(doubled)
    assert len(dedup["range_indices"]) == len(g["range_indices"])


def test_supercell_graph():
    g = add_radius_bonds(structure_to_graph(_cubic()), radius=3.5)
    size = (2, 2, 2)
    sg = to_supercell_graph(g, size)
    assert len(sg["node_number"]) == 8
    # open-boundary supercell: each unit-cell edge maps only where the
    # translated source cell stays in bounds -> interior bonds only.
    # SC radius 3.5 -> 6 neighbors per atom; in a 2x2x2 block each node
    # keeps 3 (one per axis; the other direction leaves the block)
    counts = np.bincount(sg["range_indices"][:, 0], minlength=8)
    assert np.all(counts == 3)
    # distances preserved
    np.testing.assert_allclose(sg["range_attributes"][:, 0], 3.0, rtol=1e-6)


def test_asymmetric_unit_graph_trivial_symmetry():
    g = structure_to_graph(_fcc(), symmetrize=True)
    # gated fallback: trivial spacegroup, every node its own representative
    assert int(g["spacegroup"][0]) == 1
    g = add_radius_bonds(g, radius=3.0)
    asu = to_asymmetric_unit_graph(g)
    assert len(asu["node_number"]) == 4
    np.testing.assert_array_equal(asu["range_indices"], g["range_indices"])
    assert asu["range_symmop"].shape[1:] == (4, 4)


def test_asymmetric_unit_graph_with_orbits():
    """Hand-built symmetry: BCC where both sites map to one Wyckoff orbit."""
    g = structure_to_graph(_bcc())
    g = symmetrize_graph(g)
    # simulate a detected orbit: both atoms equivalent to rep 0
    g["node_asymmetric_mapping"] = np.array([0, 0])
    g["node_multiplicity"] = np.array([2, 2])
    g = add_radius_bonds(g, radius=2.7)
    asu = to_asymmetric_unit_graph(g)
    assert len(asu["node_number"]) == 1
    # only edges ending at node 0 are kept, senders remapped to rep index 0
    n_in_0 = int(np.sum(g["range_indices"][:, 0] == 0))
    assert len(asu["range_indices"]) == n_in_0
    assert np.all(asu["range_indices"] == 0)


def test_preprocessor_hash_and_eq():
    assert RadiusUnitCell(3.0) == RadiusUnitCell(3.0)
    assert RadiusUnitCell(3.0) != RadiusUnitCell(4.0)
    assert RadiusUnitCell(3.0) != KNNUnitCell(12)
    assert isinstance(RadiusUnitCell(3.0).hash(), str)
    cfg = RadiusSuperCell(3.0, size=(2, 2, 2)).get_config()
    assert cfg["preprocessor"] == "RadiusSuperCell"
    assert cfg["radius"] == 3.0

    # usable as dict keys (the reference's caching pattern)
    cache = {RadiusUnitCell(3.0): "a", VoronoiUnitCell(): "b"}
    assert cache[RadiusUnitCell(3.0)] == "a"


def test_preprocessors_produce_graphs():
    for prep in (RadiusUnitCell(3.5), KNNUnitCell(6), VoronoiUnitCell(),
                 RadiusSuperCell(3.5, size=(2, 2, 2))):
        out = prep(_fcc())
        assert "range_indices" in out and len(out["range_indices"]) > 0
        assert "node_number" in out
