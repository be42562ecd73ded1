"""In-memory graph list / dataset.

Parity: ``kgcnn/data/base.py:18`` (MemoryGraphList) and ``:330``
(MemoryGraphDataset): property views, ``map_list``, ``clean``, pickle
save/load, CSV labels — plus the TPU-native replacement for ``.tensor()``:
``to_batches(...)`` producing bucketed GraphBatch objects.
"""
from __future__ import annotations

import logging
import os
import pickle
from collections.abc import MutableSequence
from typing import Any, Callable, Dict, List, Optional, Sequence, Union

import numpy as np

from .graph_dict import GraphDict
from ..batch import GraphBatch, batch_graphs, bucket_size

logger = logging.getLogger(__name__)


class MemoryGraphList(MutableSequence):
    def __init__(self, graphs: Optional[Sequence[dict]] = None):
        self._list: List[GraphDict] = [GraphDict(g) for g in (graphs or [])]

    # MutableSequence interface
    def __getitem__(self, idx):
        if isinstance(idx, slice):
            return MemoryGraphList(self._list[idx])
        if isinstance(idx, (list, np.ndarray)):
            return MemoryGraphList([self._list[int(i)] for i in np.asarray(idx).reshape(-1)])
        return self._list[idx]

    def __setitem__(self, idx, value):
        self._list[idx] = GraphDict(value)

    def __delitem__(self, idx):
        del self._list[idx]

    def __len__(self):
        return len(self._list)

    def insert(self, idx, value):
        self._list.insert(idx, GraphDict(value))

    # kgcnn-style property API (data/base.py:116-200)
    def assign_property(self, key: str, values: Sequence) -> "MemoryGraphList":
        assert len(values) == len(self._list)
        for g, v in zip(self._list, values):
            g.assign_property(key, v)
        return self

    def obtain_property(self, key: str) -> List:
        return [g.obtain_property(key) for g in self._list]

    def map_list(self, method, **kwargs) -> "MemoryGraphList":
        """Apply a preprocessor (by name or callable) to every graph
        (``data/base.py:241``)."""
        for g in self._list:
            g.apply_preprocessor(method, **kwargs)
        return self

    def clean(self, inputs: Sequence[str]) -> np.ndarray:
        """Drop graphs missing any required property (``data/base.py:275``).
        Returns kept indices."""
        keep, removed = [], []
        for i, g in enumerate(self._list):
            ok = all(k in g and g[k] is not None and np.asarray(g[k]).size > 0
                     for k in inputs)
            (keep if ok else removed).append(i)
        if removed:
            logger.warning("clean: removing %d graphs missing %s", len(removed), inputs)
        self._list = [self._list[i] for i in keep]
        return np.array(keep)

    # TPU batching (replaces data/base.py:203 .tensor())
    def to_batch(self, **kwargs) -> GraphBatch:
        """All graphs in one GraphBatch."""
        return batch_graphs([dict(g) for g in self._list], **kwargs)

    def to_batches(self, batch_size: int, shuffle: bool = False,
                   seed: int = 0, drop_last: bool = False,
                   bucket: bool = True, **kwargs) -> List[GraphBatch]:
        """Split into GraphBatches of ``batch_size`` graphs with bucketed
        padded shapes (bounded recompilation under jit)."""
        idx = np.arange(len(self._list))
        if shuffle:
            np.random.RandomState(seed).shuffle(idx)
        out = []
        for start in range(0, len(idx), batch_size):
            chunk = idx[start:start + batch_size]
            if drop_last and len(chunk) < batch_size:
                break
            graphs = [dict(self._list[i]) for i in chunk]
            bkw = dict(kwargs)
            if bucket and "n_graph_pad" not in bkw:
                bkw["n_graph_pad"] = batch_size + 1
            out.append(batch_graphs(graphs, **bkw))
        return out

    def batch_shape_hint(self, batch_size: int, edge_index_key: str = "edge_indices",
                         angle_index_key: str = "angle_indices_nodes",
                         headroom: float = 1.1) -> Dict[str, int]:
        """Compute fixed bucket pads covering the whole dataset: the max
        total (nodes, edges, angles) over any batch_size-window, rounded up.
        Use these to get a SINGLE compiled shape for all batches."""
        nn = np.array([int(np.asarray(g[edge_index_key]).shape[0]) for g in self._list])
        nv = np.array([g._num_nodes(edge_index_key) if hasattr(g, "_num_nodes")
                       else len(g.get("node_number", [])) for g in self._list])
        na = np.array([int(np.asarray(g.get(angle_index_key, np.zeros((0, 3)))).shape[0])
                       for g in self._list])

        def worst(a):
            s = np.sort(a)[::-1][:batch_size].sum()
            return int(s * headroom) + 1

        hint = {
            "n_node_pad": bucket_size(worst(nv) + 1),
            "n_edge_pad": bucket_size(worst(nn)),
            "n_graph_pad": batch_size + 1,
        }
        if na.sum() > 0:
            hint["n_angle_pad"] = bucket_size(worst(na))
        return hint


class MemoryGraphDataset(MemoryGraphList):
    """Adds disk location + save/load + CSV labels
    (``kgcnn/data/base.py:330``)."""

    def __init__(self, data_directory: Optional[str] = None,
                 dataset_name: Optional[str] = None,
                 file_name: Optional[str] = None,
                 file_directory: Optional[str] = None,
                 graphs: Optional[Sequence[dict]] = None, **kwargs):
        super().__init__(graphs)
        self.data_directory = data_directory
        self.dataset_name = dataset_name
        self.file_name = file_name
        self.file_directory = file_directory

    @property
    def file_path(self) -> Optional[str]:
        if self.data_directory and self.file_name:
            return os.path.join(self.data_directory, self.file_name)
        return None

    def save(self, filepath: Optional[str] = None) -> "MemoryGraphDataset":
        path = filepath or (self.file_path and self.file_path + ".pickle") or \
            f"{self.dataset_name or 'dataset'}.pickle"
        with open(path, "wb") as f:
            pickle.dump([dict(g) for g in self._list], f)
        logger.info("saved %d graphs to %s", len(self), path)
        return self

    def load(self, filepath: Optional[str] = None) -> "MemoryGraphDataset":
        path = filepath or (self.file_path and self.file_path + ".pickle") or \
            f"{self.dataset_name or 'dataset'}.pickle"
        with open(path, "rb") as f:
            self._list = [GraphDict(g) for g in pickle.load(f)]
        logger.info("loaded %d graphs from %s", len(self), path)
        return self

    def read_in_table_file(self, file_path: Optional[str] = None, **kwargs):
        """Read CSV labels into ``data_frame`` (``data/base.py:448``)."""
        import pandas as pd
        path = file_path or self.file_path
        self.data_frame = pd.read_csv(path, **kwargs)
        return self

    def assert_valid_model_input(self, inputs: Sequence[str]):
        """Validate required properties exist on all graphs
        (``data/base.py:479``)."""
        missing = set()
        for g in self._list:
            for k in inputs:
                if k not in g:
                    missing.add(k)
        if missing:
            raise ValueError(f"dataset missing model inputs: {sorted(missing)}")
