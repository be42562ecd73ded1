"""MD inference pipeline (parity: ``kgcnn/moldyn/base.py:12``
MolDynamicsModelPredictor): graph preprocessors (neighbor list rebuild per
step) -> jitted model forward -> output translation -> postprocessors
(e.g. scaler inverse).

TPU design: padded shapes are BUCKETED so MD steps with fluctuating neighbor
counts reuse compiled executables instead of recompiling (the reference had
no compilation to worry about; under jit this is the recompilation-control
strategy of SURVEY §7).
"""
from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional, Sequence

import numpy as np
import jax

from ..batch import GraphBatch, batch_graphs, bucket_size


class MolDynamicsModelPredictor:
    def __init__(self, model=None, variables=None,
                 graph_preprocessors: Sequence[Callable] = (),
                 graph_postprocessors: Sequence[Callable] = (),
                 model_postprocessors: Sequence[Callable] = (),
                 batch_kwargs: Optional[Dict] = None,
                 output_translation: Optional[Dict[str, str]] = None,
                 use_predict: bool = False):
        self.model = model
        self.variables = variables
        self.graph_preprocessors = list(graph_preprocessors)
        self.graph_postprocessors = list(graph_postprocessors)
        self.model_postprocessors = list(model_postprocessors)
        self.batch_kwargs = batch_kwargs or {}
        self.output_translation = output_translation or {
            "energy": "energy", "force": "force", "charge": "charge"}
        self._jitted = None
        self._compiled_shapes = set()

    def _forward(self, batch: GraphBatch):
        if self._jitted is None:
            model = self.model

            def fwd(variables, b):
                return model.apply(variables, b)

            self._jitted = jax.jit(fwd)
        return self._jitted(self.variables, batch)

    def __call__(self, graph_list: List[dict]) -> List[dict]:
        graphs = [dict(g) for g in graph_list]
        for pre in self.graph_preprocessors:
            graphs = [dict(g, **pre(g)) for g in graphs]

        kw = dict(self.batch_kwargs)
        # bucket pads to bound recompilation over MD steps
        tot_n = sum(len(g["node_number"]) for g in graphs)
        tot_e = sum(len(g.get("range_indices", g.get("edge_indices"))) for g in graphs)
        kw.setdefault("n_node_pad", bucket_size(tot_n + 1))
        kw.setdefault("n_edge_pad", bucket_size(max(tot_e, 1)))
        for g in graphs:
            if "edge_indices" not in g and "range_indices" in g:
                g["edge_indices"] = g["range_indices"]
        batch = batch_graphs(graphs, global_keys=("total_charge",), **kw)

        out = self._forward(batch)
        results = []
        node_mask = np.asarray(batch.node_mask)
        gid = np.asarray(batch.graph_id)
        for i, g in enumerate(graphs):
            res = {}
            sel = node_mask & (gid == i)
            for out_name, key in self.output_translation.items():
                if key not in out and out_name not in out:
                    continue
                val = np.asarray(out.get(out_name, out.get(key)))
                if val.shape[0] == batch.n_graphs:
                    res[out_name] = val[i]
                elif val.shape[0] == batch.n_node:
                    res[out_name] = val[sel]
            for post in self.graph_postprocessors:
                res = dict(res, **post(res, g))
            results.append(res)
        return results


class ExtensiveEnergyForceScalerPostprocessor:
    """Undo label scaling at MD time
    (parity: ``kgcnn/graph/postprocessor.py:6``)."""

    def __init__(self, scaler, energy: str = "energy", force: str = "force",
                 atomic_number: str = "node_number"):
        self.scaler = scaler
        self.energy = energy
        self.force = force
        self.atomic_number = atomic_number

    def __call__(self, result: dict, graph: dict) -> dict:
        out = dict(result)
        z = [np.asarray(graph[self.atomic_number])]
        if self.energy in result:
            e = np.atleast_1d(np.asarray(result[self.energy]).reshape(-1)[0])
            out[self.energy] = self.scaler.inverse_transform(e, z)
        if self.force in result:
            out[self.force] = np.asarray(result[self.force]) * self.scaler.scale_[0]
        return out
