"""SchNet model (parity: ``kgcnn/literature/Schnet.py:46`` make_model /
``:174`` make_crystal_model).

Crystal/periodic support is implicit: if the batch carries
``edges['range_image']`` + ``globals['graph_lattice']``, edge vectors include
the periodic shift (see ``layers/geometry.py``), which is exactly what
make_crystal_model adds in the reference.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import flax.linen as nn

from ..batch import GraphBatch
from ..layers.conv.schnet import SchNetInteraction
from ..layers.geometry import edge_distances, gauss_basis
from ..layers.mlp import Dense, MLP
from ..layers.aggr import pool_nodes_to_graph
from .common import OptionalInputEmbedding
from .registry import update_model_kwargs

Array = jax.Array

model_default = dict(
    input_embedding={"node": {"input_dim": 95, "output_dim": 64}},
    make_distance=True,
    expand_distance=True,
    gauss_args={"bins": 20, "distance_max": 4.0, "offset": 0.0, "sigma": 0.4},
    interaction_args={"units": 128, "use_bias": True,
                      "activation": "shifted_softplus", "cfconv_pool": "sum"},
    node_pooling_args={"pooling_method": "sum"},
    depth=4,
    last_mlp={"units": [128, 64], "activation": ["shifted_softplus", "shifted_softplus"]},
    output_embedding="graph",
    use_output_mlp=True,
    output_mlp={"units": [64, 1], "activation": ["shifted_softplus", "linear"]},
    # "bfloat16" runs the interaction dense layers in bf16 on the MXU
    # (params + geometry + readout stay float32). Measured on v5e: bf16 is
    # ~4.5x SLOWER for the energy+force train step (3.6M vs 16.6M edges/s) —
    # the step is gather/scatter-bound, so the casts only add overhead.
    # Keep None (f32) unless the model is matmul-dominated.
    dtype=None,
    # True switches to the dense-block execution mode (layers/dense_block.py):
    # per-molecule (G, M, M) padded message passing with ZERO gather/scatter
    # in the hot loop — same math, same parameter pytree, trades ~M^2/E_avg
    # extra elementwise work for removing the serialized gather chains.
    # Small non-periodic molecules only; see PERF.md r3.
    dense_block=False,
    # True wraps each interaction block in jax.checkpoint (flax nn.remat):
    # the backward recomputes the block's matmuls instead of reading stored
    # (E, F) / (G, M, M, F) residuals from HBM — trades MXU FLOPs (cheap)
    # for HBM traffic (the bottleneck) in force training's grad-of-grad.
    remat=False,
)


class Schnet(nn.Module):
    config: Dict[str, Any]

    @nn.compact
    def __call__(self, batch: GraphBatch, train: bool = False) -> Dict[str, Array]:
        cfg = self.config
        z = batch.nodes.get("node_attributes", batch.nodes.get("node_number"))
        n = OptionalInputEmbedding(**cfg["input_embedding"]["node"])(z)

        if cfg.get("dense_block"):
            return self._dense_forward(cfg, batch, n)

        if cfg["make_distance"]:
            ed = edge_distances(batch)
        else:
            ed = batch.edges["edge_distance"]
        if cfg["expand_distance"]:
            ed = gauss_basis(ed, **cfg["gauss_args"])
        # zero the basis on padding edges so filters see exact zeros
        ed = ed * batch.edge_mask[:, None].astype(ed.dtype)

        import jax.numpy as jnp
        dtype = {"bfloat16": jnp.bfloat16, "float32": None,
                 None: None}.get(cfg.get("dtype"), cfg.get("dtype"))
        units = cfg["interaction_args"]["units"]
        n = Dense(units, activation="linear", name="embed_to_units")(n)
        Inter = nn.remat(SchNetInteraction) if cfg.get("remat") \
            else SchNetInteraction
        inter_args = dict(cfg["interaction_args"])
        if inter_args.get("fused_chain"):
            # the fused-chain kernels recompute the gauss basis from
            # positions in VMEM — only valid when the basis really is
            # gauss(distance(positions))
            if not (cfg["make_distance"] and cfg["expand_distance"]):
                raise ValueError("fused_chain requires make_distance and "
                                 "expand_distance")
            inter_args["gauss_args"] = cfg["gauss_args"]
        for i in range(cfg["depth"]):
            n = Inter(**inter_args, dtype=dtype,
                      name=f"interaction_{i}")(batch, n, ed)

        n = MLP(cfg["last_mlp"]["units"], activation=cfg["last_mlp"]["activation"],
                name="last_mlp")(n)

        if cfg["output_embedding"] == "graph":
            out = n * batch.node_mask[:, None].astype(n.dtype)
            out = pool_nodes_to_graph(batch, out, **cfg["node_pooling_args"])
            if cfg["use_output_mlp"]:
                out = MLP(cfg["output_mlp"]["units"],
                          activation=cfg["output_mlp"]["activation"],
                          name="output_mlp")(out)
        elif cfg["output_embedding"] == "node":
            out = n
            if cfg["use_output_mlp"]:
                out = MLP(cfg["output_mlp"]["units"],
                          activation=cfg["output_mlp"]["activation"],
                          name="output_mlp")(n)
        else:
            raise ValueError(f"unsupported output_embedding {cfg['output_embedding']}")
        return {"output": out}


    def _dense_forward(self, cfg, batch: GraphBatch, n: Array) -> Dict[str, Array]:
        """Dense-block execution (``layers/dense_block.py``): identical math
        and parameter pytree to the flat path, zero gather/scatter in the
        interaction loop. Requires small non-periodic simple graphs."""
        import jax.numpy as jnp
        from ..layers.dense_block import (dense_adjacency, dense_pair_distances,
                                          padded_node_mask)
        from ..layers.conv.schnet import SchNetInteractionDense
        from ..batch import flat_to_padded, padded_to_flat

        if "range_image" in batch.edges:
            raise ValueError("dense_block=True does not support periodic "
                             "batches (range_image present) — use the flat "
                             "path for crystals")
        if not (cfg["make_distance"] and cfg["expand_distance"]):
            raise ValueError("dense_block=True requires make_distance and "
                             "expand_distance (distances are recomputed "
                             "densely from coordinates)")

        adj = dense_adjacency(batch)  # (G, M, M)
        d = dense_pair_distances(batch.nodes["node_coordinates"], batch, adj)
        ed = gauss_basis(d[..., None], **cfg["gauss_args"])
        ed = ed * adj[..., None]

        dtype = {"bfloat16": jnp.bfloat16, "float32": None,
                 None: None}.get(cfg.get("dtype"), cfg.get("dtype"))
        units = cfg["interaction_args"]["units"]
        n = Dense(units, activation="linear", name="embed_to_units")(n)
        x = flat_to_padded(n, batch)  # (G, M, U)
        Inter = nn.remat(SchNetInteractionDense) if cfg.get("remat") \
            else SchNetInteractionDense
        for i in range(cfg["depth"]):
            x = Inter(**cfg["interaction_args"], dtype=dtype,
                      name=f"interaction_{i}")(adj, x, ed)

        x = MLP(cfg["last_mlp"]["units"], activation=cfg["last_mlp"]["activation"],
                name="last_mlp")(x)

        nmask = padded_node_mask(batch)  # (G, M)
        if cfg["output_embedding"] == "graph":
            pool = cfg["node_pooling_args"].get("pooling_method", "sum")
            out = jnp.sum(x * nmask[..., None].astype(x.dtype), axis=1)
            if pool == "mean":
                out = out / jnp.maximum(jnp.sum(nmask, axis=1), 1.0)[:, None]
            elif pool != "sum":
                raise ValueError(f"dense_block pooling {pool!r} unsupported")
            if cfg["use_output_mlp"]:
                out = MLP(cfg["output_mlp"]["units"],
                          activation=cfg["output_mlp"]["activation"],
                          name="output_mlp")(out)
        elif cfg["output_embedding"] == "node":
            out = padded_to_flat(x, batch)
            if cfg["use_output_mlp"]:
                out = MLP(cfg["output_mlp"]["units"],
                          activation=cfg["output_mlp"]["activation"],
                          name="output_mlp")(out)
        else:
            raise ValueError(f"unsupported output_embedding {cfg['output_embedding']}")
        return {"output": out}


def make_model(**kwargs) -> Schnet:
    cfg = update_model_kwargs(model_default, kwargs)
    return Schnet(config=cfg)


def make_crystal_model(**kwargs) -> Schnet:
    """Periodic variant — identical module; periodicity comes from the batch
    carrying ``range_image`` + ``graph_lattice``."""
    return make_model(**kwargs)
