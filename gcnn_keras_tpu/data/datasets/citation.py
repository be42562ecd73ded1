"""Cora citation datasets (parity: ``kgcnn/data/datasets/CoraDataset.py`` /
``CoraLuDataset.py``): single large graph, node classification."""
from __future__ import annotations

import os

import numpy as np

from ..dataset import MemoryGraphDataset
from ..download import DownloadDataset
from ...graph.preprocess import (
    set_edge_weights_uniform, normalize_edge_weights_symmetric,
    make_undirected_edges,
)


class CoraDataset(MemoryGraphDataset):
    """Full Cora (19793 nodes, 70 classes)."""

    _url = "https://github.com/abojchevski/graph2gauss/raw/master/data/cora.npz"

    def __init__(self, reload: bool = False, **kwargs):
        dl = DownloadDataset("Cora", download_url=self._url,
                             download_file_name="cora.npz", reload=reload)
        super().__init__(data_directory=dl.data_directory, dataset_name="Cora",
                         **kwargs)

    def read_in_memory(self, **kwargs):
        path = os.path.join(self.data_directory, "cora.npz")
        if not os.path.exists(path):
            raise FileNotFoundError(
                f"{path} missing — offline? Use SyntheticCitationDataset.")
        import scipy.sparse as sp
        loader = np.load(path, allow_pickle=True)
        adj = sp.csr_matrix((loader["adj_data"], loader["adj_indices"],
                             loader["adj_indptr"]), shape=loader["adj_shape"])
        attr = sp.csr_matrix((loader["attr_data"], loader["attr_indices"],
                              loader["attr_indptr"]), shape=loader["attr_shape"])
        labels = loader["labels"]
        coo = adj.tocoo()
        g = {
            "node_attributes": np.asarray(attr.todense(), dtype=np.float32),
            "node_labels": labels.astype(np.int64),
            "edge_indices": np.stack([coo.row, coo.col], axis=1).astype(np.int64),
        }
        g = make_undirected_edges(g)
        g = set_edge_weights_uniform(g)
        g = normalize_edge_weights_symmetric(g)
        self.append(g)
        return self


class CoraLuDataset(CoraDataset):
    """Cora subset of Lu & Getoor (2708 nodes, 7 classes)."""

    _url = ("https://linqs-data.soe.ucsc.edu/public/lbc/cora.tgz")

    def __init__(self, reload: bool = False, **kwargs):
        dl = DownloadDataset("CoraLu", download_url=self._url,
                             download_file_name="cora.tgz", unpack_tar=True,
                             reload=reload)
        MemoryGraphDataset.__init__(self, data_directory=dl.data_directory,
                                    dataset_name="CoraLu", **kwargs)

    def read_in_memory(self, **kwargs):
        content = os.path.join(self.data_directory, "cora", "cora.content")
        cites = os.path.join(self.data_directory, "cora", "cora.cites")
        if not os.path.exists(content):
            raise FileNotFoundError(
                f"{content} missing — offline? Use SyntheticCitationDataset.")
        rows = [line.split() for line in open(content)]
        ids = {r[0]: i for i, r in enumerate(rows)}
        feats = np.array([[float(v) for v in r[1:-1]] for r in rows], dtype=np.float32)
        class_names = sorted({r[-1] for r in rows})
        cls = {c: i for i, c in enumerate(class_names)}
        labels = np.array([cls[r[-1]] for r in rows], dtype=np.int64)
        edges = []
        for line in open(cites):
            a, b = line.split()
            if a in ids and b in ids:
                edges.append([ids[a], ids[b]])
        g = {
            "node_attributes": feats,
            "node_labels": labels,
            "edge_indices": np.array(edges, dtype=np.int64),
        }
        g = make_undirected_edges(g)
        g = set_edge_weights_uniform(g)
        g = normalize_edge_weights_symmetric(g)
        self.append(g)
        return self
