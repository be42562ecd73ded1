"""Real-format dataset parsers exercised on handcrafted fixtures (the
offline substitute for downloading Cora/TUDataset/QM7)."""
import os
import numpy as np
import pytest


def test_coralu_parser(tmp_path):
    from gcnn_keras_tpu.data.datasets.citation import CoraLuDataset
    d = tmp_path / "cora"
    d.mkdir()
    # cora.content: <id> <f0..f3> <class>
    (d / "cora.content").write_text(
        "p1 1 0 0 1 Neural_Networks\n"
        "p2 0 1 0 0 Theory\n"
        "p3 1 1 0 0 Neural_Networks\n")
    (d / "cora.cites").write_text("p1 p2\np2 p3\npX p1\n")
    ds = CoraLuDataset.__new__(CoraLuDataset)
    from gcnn_keras_tpu.data.dataset import MemoryGraphDataset
    MemoryGraphDataset.__init__(ds, data_directory=str(tmp_path),
                                dataset_name="CoraLu")
    ds.read_in_memory()
    g = ds[0]
    assert g["node_attributes"].shape == (3, 4)
    assert set(np.asarray(g["node_labels"])) == {0, 1}
    # undirected + normalized weights exist
    assert "edge_weights" in g
    ei = np.asarray(g["edge_indices"])
    assert [1, 0] in ei.tolist() and [0, 1] in ei.tolist()


def test_tudataset_parser(tmp_path):
    from gcnn_keras_tpu.data.datasets.tudataset import GraphTUDataset2020
    name = "TOY"
    d = tmp_path
    # two graphs: nodes 1-3 (graph 1), nodes 4-5 (graph 2); 1-indexed
    (d / f"{name}_A.txt").write_text("1, 2\n2, 1\n2, 3\n3, 2\n4, 5\n5, 4\n")
    (d / f"{name}_graph_indicator.txt").write_text("1\n1\n1\n2\n2\n")
    (d / f"{name}_graph_labels.txt").write_text("1\n-1\n")
    (d / f"{name}_node_labels.txt").write_text("0\n1\n0\n2\n2\n")
    ds = GraphTUDataset2020.__new__(GraphTUDataset2020)
    from gcnn_keras_tpu.data.dataset import MemoryGraphDataset
    MemoryGraphDataset.__init__(ds, data_directory=str(d), dataset_name=name)
    ds.read_in_memory()
    assert len(ds) == 2
    assert len(ds[0]["node_number"]) == 3
    assert ds[0]["edge_indices"].shape == (4, 2)
    assert ds[1]["edge_indices"].shape == (2, 2)
    assert int(ds[0]["edge_indices"].max()) <= 2  # local indexing
    assert ds[1]["graph_labels"][0] == -1


def test_qm7_parser(tmp_path):
    from gcnn_keras_tpu.data.datasets.qm import QM7Dataset
    from scipy.io import savemat
    R = np.zeros((2, 23, 3)); Z = np.zeros((2, 23))
    R[0, :3] = [[0, 0, 0], [1, 0, 0], [0, 1, 0]]
    Z[0, :3] = [6, 1, 1]
    R[1, :2] = [[0, 0, 0], [2, 0, 0]]
    Z[1, :2] = [8, 8]
    savemat(str(tmp_path / "qm7.mat"), {"R": R, "Z": Z,
                                        "T": np.array([[-100.0, -200.0]])})
    ds = QM7Dataset.__new__(QM7Dataset)
    from gcnn_keras_tpu.data.dataset import MemoryGraphDataset
    MemoryGraphDataset.__init__(ds, data_directory=str(tmp_path),
                                dataset_name="QM7")
    ds.read_in_memory()
    assert len(ds) == 2
    assert np.array_equal(ds[0]["node_number"], [6, 1, 1])
    assert len(ds[1]["node_number"]) == 2
    assert abs(ds[0]["graph_labels"][0] + 100) < 1e-6


def test_sdf_reader(tmp_path):
    from gcnn_keras_tpu.mol.io import read_sdf_coordinates
    sdf = """mol1
  test

  3  2  0  0  0  0  0  0  0  0999 V2000
    0.0000    0.0000    0.0000 O   0  0
    0.9600    0.0000    0.0000 H   0  0
   -0.2400    0.9300    0.0000 H   0  0
  1  2  1  0
  1  3  1  0
M  END
$$$$
"""
    p = tmp_path / "test.sdf"
    p.write_text(sdf)
    mols = read_sdf_coordinates(str(p))
    assert len(mols) == 1
    z, xyz = mols[0]
    assert z == [8, 1, 1]
    assert abs(xyz[1][0] - 0.96) < 1e-6


def test_mol_converter_process_pool():
    """MolConverter with the process pool must match serial conversion
    (parity surface: kgcnn/mol/convert.py:168 multiprocessing path)."""
    pytest.importorskip("rdkit")
    from gcnn_keras_tpu.mol.convert import MolConverter

    smiles = ["C", "CC", "CCO", "c1ccccc1"]
    serial = MolConverter(num_workers=1).smile_to_mol(smiles)
    parallel = MolConverter(num_workers=2, pool="process",
                            make_conformers=False,
                            optimize_conformer=False).smile_to_mol(smiles)
    assert len(serial) == len(parallel) == 4
    assert all(b is not None for b in parallel)


def test_openbabel_backend_gated():
    """Without openbabel installed the backend must raise a CLEAR ImportError
    at construction (same optional gating as the reference), and
    babel_available() reports the gate."""
    from gcnn_keras_tpu.mol import graph_babel

    if graph_babel.babel_available():
        mg = graph_babel.MolecularGraphOpenBabel().from_smiles("CCO")
        assert len(mg.node_number) >= 3
    else:
        with pytest.raises(ImportError):
            graph_babel.MolecularGraphOpenBabel()
