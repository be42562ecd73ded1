"""MEGNet model (parity: ``kgcnn/literature/Megnet.py`` make_model /
make_crystal_model; block at ``kgcnn/layers/conv/megnet_conv.py:10``):
node/edge/state triple updates with residual dense blocks and Set2Set
readout over both nodes and edges."""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..batch import GraphBatch
from ..layers.aggr import (
    gather_nodes, gather_state, pool_edges_to_nodes, pool_nodes_to_graph,
    pool_edges_to_graph,
)
from ..layers.geometry import edge_distances, gauss_basis
from ..layers.mlp import Dense, MLP
from ..layers.pool.set2set import Set2Set
from .common import OptionalInputEmbedding
from .registry import update_model_kwargs

Array = jax.Array

model_default = dict(
    input_embedding={"node": {"input_dim": 95, "output_dim": 64},
                     "graph": {"input_dim": 100, "output_dim": 64}},
    make_distance=True, expand_distance=True,
    gauss_args={"bins": 20, "distance_max": 4.0, "offset": 0.0, "sigma": 0.4},
    meg_block_args={"node_embed": [64, 32, 32], "edge_embed": [64, 32, 32],
                    "env_embed": [64, 32, 32], "activation": "softplus2"},
    set2set_args={"channels": 16, "T": 3, "pooling_method": "sum",
                  "init_qstar": "0"},
    node_ff_args={"units": [64, 32], "activation": "softplus2"},
    edge_ff_args={"units": [64, 32], "activation": "softplus2"},
    state_ff_args={"units": [64, 32], "activation": "softplus2"},
    nblocks=3,
    has_ff=True,
    dropout=None,
    use_set2set=True,
    output_embedding="graph",
    output_mlp={"units": [32, 16, 1], "activation": ["softplus2", "softplus2", "linear"]},
)


class MEGnetBlock(nn.Module):
    node_embed: Any = (64, 32, 32)
    edge_embed: Any = (64, 32, 32)
    env_embed: Any = (64, 32, 32)
    activation: Any = "softplus2"

    @nn.compact
    def __call__(self, batch: GraphBatch, n: Array, e: Array, u: Array):
        act = self.activation
        # edge update: concat [e, n_i, n_j, u]
        ni = gather_nodes(n, batch.receivers)
        nj = gather_nodes(n, batch.senders)
        ue = jnp.take(u, batch.edge_graph_id, axis=0)
        # reference megnet_conv.py concat orders + LINEAR last dense of
        # each phi MLP; block pooling default is MEAN
        ec = jnp.concatenate([ni, nj, e, ue], axis=-1)
        ep = MLP(list(self.edge_embed), activation=act, last_linear=True,
                 name="edge_mlp")(ec)
        # node update: concat [pooled ep, n, u] (megnet_conv.py:112)
        eu = pool_edges_to_nodes(batch, ep, mode="mean")
        nc = jnp.concatenate([eu, n, gather_state(u, batch)], axis=-1)
        np_ = MLP(list(self.node_embed), activation=act, last_linear=True,
                  name="node_mlp")(nc)
        # state update: concat [mean edges, mean nodes, u] (megnet_conv.py:121)
        n_mean = pool_nodes_to_graph(batch, np_, mode="mean")
        e_mean = pool_edges_to_graph(batch, ep, mode="mean")
        uc = jnp.concatenate([e_mean, n_mean, u], axis=-1)
        up = MLP(list(self.env_embed), activation=act, last_linear=True,
                 name="env_mlp")(uc)
        return np_, ep, up


class Megnet(nn.Module):
    config: Dict[str, Any]

    @nn.compact
    def __call__(self, batch: GraphBatch, train: bool = False) -> Dict[str, Array]:
        cfg = self.config
        x = batch.nodes.get("node_attributes", batch.nodes.get("node_number"))
        n = OptionalInputEmbedding(**cfg["input_embedding"]["node"])(x)
        if cfg["make_distance"]:
            ed = edge_distances(batch)
            if cfg["expand_distance"]:
                ed = gauss_basis(ed, **cfg["gauss_args"])
        else:
            ed = batch.edges["edge_attributes"]
        ed = ed * batch.edge_mask[:, None].astype(ed.dtype)
        us = batch.globals.get("graph_attributes")
        if us is None:
            us = jnp.zeros((batch.n_graphs, 16), dtype=n.dtype)

        # first dense blocks
        vp = MLP(cfg["node_ff_args"]["units"], activation=cfg["node_ff_args"]["activation"],
                 name="node_ff_0")(n)
        ep = MLP(cfg["edge_ff_args"]["units"], activation=cfg["edge_ff_args"]["activation"],
                 name="edge_ff_0")(ed)
        up = MLP(cfg["state_ff_args"]["units"], activation=cfg["state_ff_args"]["activation"],
                 name="state_ff_0")(us)

        for i in range(cfg["nblocks"]):
            if cfg["has_ff"] and i > 0:
                v1 = MLP(cfg["node_ff_args"]["units"],
                         activation=cfg["node_ff_args"]["activation"],
                         name=f"node_ff_{i}")(vp)
                e1 = MLP(cfg["edge_ff_args"]["units"],
                         activation=cfg["edge_ff_args"]["activation"],
                         name=f"edge_ff_{i}")(ep)
                u1 = MLP(cfg["state_ff_args"]["units"],
                         activation=cfg["state_ff_args"]["activation"],
                         name=f"state_ff_{i}")(up)
            else:
                v1, e1, u1 = vp, ep, up
            v2, e2, u2 = MEGnetBlock(**cfg["meg_block_args"],
                                     name=f"block_{i}")(batch, v1, e1, u1)
            # residual adds the PRE-ff value (reference Megnet.py:
            # vp = LazyAdd()([vp2, vp]))
            vp = v2 + vp
            ep = e2 + ep
            up = u2 + up

        if cfg["use_set2set"]:
            # reference projects to set2set channels first (Megnet.py)
            from ..layers.mlp import Dense
            vp_p = Dense(cfg["set2set_args"]["channels"], activation="linear",
                         name="set2set_proj_nodes")(vp)
            ep_p = Dense(cfg["set2set_args"]["channels"], activation="linear",
                         name="set2set_proj_edges")(ep)
            vp_p = vp_p * batch.node_mask[:, None].astype(vp_p.dtype)
            node_read = Set2Set(**cfg["set2set_args"], name="set2set_nodes")(
                batch, vp_p)
            edge_read = Set2Set(**cfg["set2set_args"], name="set2set_edges")(
                batch, ep_p * batch.edge_mask[:, None].astype(ep_p.dtype),
                segment_ids=batch.edge_graph_id, num_segments=batch.n_graphs,
                mask=batch.edge_mask)
        else:
            node_read = pool_nodes_to_graph(batch, vp, mode="mean")
            edge_read = pool_edges_to_graph(batch, ep, mode="mean")

        final = jnp.concatenate([node_read, edge_read, up], axis=-1)
        out = MLP(cfg["output_mlp"]["units"],
                  activation=cfg["output_mlp"]["activation"], name="out_mlp")(final)
        return {"output": out}


def make_model(**kwargs) -> Megnet:
    cfg = update_model_kwargs(model_default, kwargs)
    return Megnet(config=cfg)


def make_crystal_model(**kwargs) -> Megnet:
    return make_model(**kwargs)
