"""PAiNN model (parity: ``kgcnn/literature/PAiNN.py:46`` make_model, body at
``:100-156``; crystal variant via periodic batch inputs)."""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..batch import GraphBatch
from ..layers.conv.painn import PAiNNconv, PAiNNUpdate, equivariant_initialize
from ..layers.geometry import (
    edge_vectors, bessel_basis_kgcnn, cosine_cutoff_envelope,
)
from ..layers.mlp import MLP
from ..layers.norm import GraphLayerNorm
from ..layers.aggr import pool_nodes_to_graph
from .common import OptionalInputEmbedding
from .registry import update_model_kwargs

Array = jax.Array

model_default = dict(
    input_embedding={"node": {"input_dim": 95, "output_dim": 128}},
    equiv_initialize_kwargs={"dim": 3, "method": "zeros"},
    bessel_basis={"num_radial": 20, "cutoff": 5.0, "envelope_exponent": 5},
    pooling_args={"pooling_method": "sum"},
    conv_args={"units": 128, "cutoff": None, "conv_pool": "sum"},
    update_args={"units": 128},
    equiv_normalization=False,
    node_normalization=False,
    depth=3,
    output_embedding="graph",
    output_mlp={"units": [128, 1], "activation": ["swish", "linear"]},
)


class PAiNN(nn.Module):
    config: Dict[str, Any]

    @nn.compact
    def __call__(self, batch: GraphBatch, train: bool = False) -> Dict[str, Array]:
        cfg = self.config
        zin = batch.nodes.get("node_attributes", batch.nodes.get("node_number"))
        s = OptionalInputEmbedding(**cfg["input_embedding"]["node"])(zin)
        v = equivariant_initialize(s, **cfg["equiv_initialize_kwargs"])

        vec = edge_vectors(batch)
        d2 = jnp.sum(vec * vec, axis=-1, keepdims=True)
        d = jnp.sqrt(jnp.maximum(d2, 1e-12))
        dir_ij = vec / d
        bb = cfg["bessel_basis"]
        # reference parity: BesselBasisLayer with poly envelope (PAiNN.py:105)
        rbf = bessel_basis_kgcnn(d, num_radial=bb["num_radial"],
                                 cutoff=bb["cutoff"],
                                 envelope_exponent=bb.get("envelope_exponent", 5))
        rbf = rbf * batch.edge_mask[:, None].astype(rbf.dtype)
        cutoff = cfg["conv_args"].get("cutoff")
        env = cosine_cutoff_envelope(d, cutoff) if cutoff is not None else None

        conv_args = dict(cfg["conv_args"])
        for i in range(cfg["depth"]):
            ds, dv = PAiNNconv(**conv_args, name=f"conv_{i}")(
                batch, s, v, rbf, env, dir_ij)
            s, v = s + ds, v + dv
            ds, dv = PAiNNUpdate(**cfg["update_args"], name=f"update_{i}")(
                batch, s, v)
            s, v = s + ds, v + dv
            if cfg["equiv_normalization"]:
                v = GraphLayerNorm(name=f"equiv_norm_{i}")(v)
            if cfg["node_normalization"]:
                s = GraphLayerNorm(name=f"node_norm_{i}")(s)

        if cfg["output_embedding"] == "graph":
            # reference order: pool nodes first, then MLP (PAiNN.py:140-142)
            pooled = pool_nodes_to_graph(batch, s, **cfg["pooling_args"])
            out = MLP(cfg["output_mlp"]["units"],
                      activation=cfg["output_mlp"]["activation"],
                      name="output_mlp")(pooled)
        elif cfg["output_embedding"] == "node":
            out = MLP(cfg["output_mlp"]["units"],
                      activation=cfg["output_mlp"]["activation"],
                      name="output_mlp")(s)
        else:
            raise ValueError(f"unsupported output_embedding {cfg['output_embedding']}")
        return {"output": out}


def make_model(**kwargs) -> PAiNN:
    cfg = update_model_kwargs(model_default, kwargs)
    return PAiNN(config=cfg)


def make_crystal_model(**kwargs) -> PAiNN:
    return make_model(**kwargs)
