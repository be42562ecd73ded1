"""GraphDict — one graph as a dict of named numpy arrays.

Parity: ``kgcnn/graph/base.py:18`` (GraphDict with assign/obtain/search
property API and ``apply_preprocessor``). A thin dict subclass: keys are
property names ('node_number', 'node_coordinates', 'edge_indices',
'range_indices', 'angle_indices_nodes', 'graph_labels', 'force', 'esp', ...),
values numpy arrays.
"""
from __future__ import annotations

import re
from typing import Callable, Dict, List, Optional, Union

import numpy as np


class GraphDict(dict):
    def assign_property(self, key: str, value) -> "GraphDict":
        if value is not None:
            self[key] = np.asarray(value)
        return self

    def obtain_property(self, key: str):
        return self.get(key, None)

    def search_properties(self, keys: Union[str, List[str]]) -> List[str]:
        """Names matching a prefix or regex (``graph/base.py:214``)."""
        if isinstance(keys, str):
            pattern = re.compile(keys)
            return sorted(k for k in self.keys()
                          if k.startswith(keys) or pattern.fullmatch(k))
        out = []
        for k in keys:
            out.extend(self.search_properties(k))
        return sorted(set(out))

    def apply_preprocessor(self, name_or_fn, **kwargs) -> "GraphDict":
        """Apply a named or callable preprocessor in place
        (``graph/base.py:260``)."""
        from ..graph.preprocess import get_preprocessor
        fn = get_preprocessor(name_or_fn, **kwargs) if isinstance(name_or_fn, str) \
            else name_or_fn
        result = fn(dict(self))
        self.update(result)
        return self

    def to_networkx(self, edge_indices: str = "edge_indices"):
        import networkx as nx
        g = nx.DiGraph()
        n = self._num_nodes(edge_indices)
        for i in range(n):
            attrs = {k: np.asarray(v)[i] for k, v in self.items()
                     if k.startswith("node_") and np.asarray(v).shape[:1] == (n,)}
            g.add_node(i, **attrs)
        ei = np.asarray(self.get(edge_indices, np.zeros((0, 2))))
        for r, s in ei:
            g.add_edge(int(s), int(r))
        return g

    def _num_nodes(self, edge_indices: str = "edge_indices") -> int:
        for key in ("node_number", "node_coordinates", "node_attributes"):
            if key in self:
                return int(np.asarray(self[key]).shape[0])
        ei = np.asarray(self.get(edge_indices, np.zeros((0, 2))))
        return int(ei.max()) + 1 if ei.size else 0
