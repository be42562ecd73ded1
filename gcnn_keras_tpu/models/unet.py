"""Graph U-Net (parity: ``kgcnn/literature/Unet.py``): GCN-style convs with
top-k pooling (mask-gated under jit, see ``layers/pool/topk.py``) on the way
down and unpooling skip connections on the way up."""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..batch import GraphBatch
from ..layers.aggr import gather_nodes, pool_weighted_edges_to_nodes, pool_nodes_to_graph
from ..layers.mlp import Dense, MLP
from ..layers.pool.topk import PoolingTopK, UnPoolingTopK
from .common import OptionalInputEmbedding
from .registry import update_model_kwargs

Array = jax.Array

model_default = dict(
    input_embedding={"node": {"input_dim": 95, "output_dim": 64}},
    hidden_dim={"units": 32, "use_bias": True, "activation": "linear"},
    top_k_args={"k": 0.3},
    activation="relu",
    use_reconnect=True,
    depth=4,
    pooling_args={"pooling_method": "mean"},
    gather_args={},
    output_embedding="graph",
    output_mlp={"units": [25, 1], "activation": ["relu", "sigmoid"]},
)


class GraphUnet(nn.Module):
    config: Dict[str, Any]

    @nn.compact
    def __call__(self, batch: GraphBatch, train: bool = False) -> Dict[str, Array]:
        cfg = self.config
        from ..ops.activ import get_activation
        act = get_activation(cfg["activation"])
        x = batch.nodes.get("node_attributes", batch.nodes.get("node_number"))
        n = OptionalInputEmbedding(**cfg["input_embedding"]["node"])(x)
        n = Dense(cfg["hidden_dim"]["units"],
                  activation=cfg["hidden_dim"]["activation"],
                  use_bias=cfg["hidden_dim"]["use_bias"], name="proj")(n)
        ew = batch.edges.get("edge_weights")
        if ew is None:
            ew = batch.edge_mask.astype(n.dtype)[:, None]

        def conv(h, name):
            hj = gather_nodes(Dense(cfg["hidden_dim"]["units"],
                                    activation="linear", name=f"{name}_w")(h),
                              batch.senders)
            return act(pool_weighted_edges_to_nodes(batch, hj, ew, mode="sum"))

        # down path with top-k gating, storing skips
        skips = []
        h = conv(n, "down_0")
        for i in range(cfg["depth"]):
            skips.append(h)
            gated, keep, _ = PoolingTopK(**cfg["top_k_args"],
                                         name=f"topk_{i}")(batch, h)
            h = conv(gated, f"down_{i + 1}")

        # up path with unpooling skip connections
        for i in reversed(range(cfg["depth"])):
            h = UnPoolingTopK(name=f"unpool_{i}")(skips[i], h,
                                                  jnp.ones_like(batch.node_mask))
            h = conv(h + skips[i], f"up_{i}")

        if cfg["output_embedding"] == "graph":
            h = h * batch.node_mask[:, None].astype(h.dtype)
            out = pool_nodes_to_graph(batch, h, **cfg["pooling_args"])
            out = MLP(cfg["output_mlp"]["units"],
                      activation=cfg["output_mlp"]["activation"], name="out_mlp")(out)
        else:
            out = MLP(cfg["output_mlp"]["units"],
                      activation=cfg["output_mlp"]["activation"], name="out_mlp")(h)
        return {"output": out}


def make_model(**kwargs) -> GraphUnet:
    cfg = update_model_kwargs(model_default, kwargs)
    return GraphUnet(config=cfg)
