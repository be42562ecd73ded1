"""MXMNet — multiplex molecular graph network, faithful rebuild of the
reference (``kgcnn/literature/MXMNet.py`` make_model; layers at
``kgcnn/layers/conv/mxmnet_conv.py:12,86``).

Two interleaved message-passing tracks per depth step:

- **Global MP** on the long-range *range* graph (``range_indices``, the
  batch's SECOND edge set ``senders2/receivers2``) with a Bessel radial
  basis of the global distances; the reference pools with the
  PoolingLocalMessages DEFAULT method ``mean`` (``mxmnet_conv.py:29``,
  ``pooling.py:27``) and runs ``propagate`` twice with SHARED weights.
- **Local MP** on the bond graph (primary edge set) with Bessel radial +
  DimeNet spherical bases over TWO angle-pair lists: pairing (ij, jk)
  (``angle_indices_1``, shares node j) and pairing (ij, ik) with the
  second vector negated (``angle_indices_2``, shares node i;
  ``MXMNet.py:146-149`` EdgeAngle(vector_scale=[1,-1])). The entry
  ``h_mlp`` is the SAME layer instance as the post-residual one
  (``mxmnet_conv.py:95,113`` — the second assignment overwrites the
  first, so both call sites share weights).

Per depth step the local MP emits a per-node output ``t`` through a
3-layer MLP + zero-initialised head; the model output is the SUM of the
per-step ``t`` (``MXMNet.py:167-173``).
"""
from __future__ import annotations

import math
from typing import Any, Dict

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..batch import GraphBatch
from ..layers.geometry import bessel_basis_kgcnn
from ..layers.mlp import Dense, MLP
from ..layers.aggr import pool_nodes_to_graph
from ..ops.segment import segment_sum
from .dimenet_pp import SphericalBasisLayer, ResidualLayer
from .registry import update_model_kwargs

Array = jax.Array

_SQRT3 = 1.7320508075688772

model_default = dict(
    input_embedding={"node": {"input_dim": 95, "output_dim": 32},
                     "edge": {"input_dim": 32, "output_dim": 32}},
    bessel_basis_local={"num_radial": 16, "cutoff": 5.0, "envelope_exponent": 5},
    bessel_basis_global={"num_radial": 16, "cutoff": 5.0, "envelope_exponent": 5},
    spherical_basis_local={"num_spherical": 7, "num_radial": 6, "cutoff": 5.0,
                           "envelope_exponent": 5},
    mlp_rbf_kwargs={"units": 32, "activation": "swish"},
    mlp_sbf_kwargs={"units": 32, "activation": "swish"},
    global_mp_kwargs={"units": 32},
    local_mp_kwargs={"units": 32, "output_units": 1,
                     "output_kernel_initializer": "zeros"},
    use_edge_attributes=False,
    depth=3,
    node_pooling_args={"pooling_method": "sum"},
    output_embedding="graph",
    use_output_mlp=True,
    output_mlp={"use_bias": [True], "units": [1], "activation": ["linear"]},
)


class MXMGlobalMP(nn.Module):
    """mxmnet_conv.py:12 — global track on the range graph.

    ``propagate`` is invoked twice with shared ``x_edge_mlp``/``linear``
    weights; pooling is segment-MEAN over receivers (reference default).
    """

    units: int = 64

    @nn.compact
    def __call__(self, batch: GraphBatch, h: Array, edge_attr: Array,
                 senders: Array, receivers: Array, edge_mask: Array) -> Array:
        n = batch.n_node
        x_edge_mlp = Dense(self.units, activation="swish", name="x_edge_mlp")
        linear = Dense(self.units, activation="linear", use_bias=False,
                       name="linear")

        def propagate(x: Array) -> Array:
            x_i = jnp.take(x, receivers, axis=0)
            x_j = jnp.take(x, senders, axis=0)
            x_edge = x_edge_mlp(
                jnp.concatenate([x_i, x_j, edge_attr], axis=-1))
            x_edge = linear(edge_attr) * x_edge
            w = edge_mask[:, None].astype(x_edge.dtype)
            s = segment_sum(x_edge * w, receivers, n)
            cnt = segment_sum(edge_mask.astype(x_edge.dtype), receivers, n)
            x_p = s / jnp.maximum(cnt, 1.0)[:, None]
            return x_p + x

        res_h = h
        h = Dense(self.units, activation="swish", name="h_mlp")(h)
        h = propagate(h)
        h = ResidualLayer(self.units, name="res1")(h)
        h = Dense(self.units, activation="swish", name="mlp")(h)
        h = h + res_h
        h = ResidualLayer(self.units, name="res2")(h)
        h = ResidualLayer(self.units, name="res3")(h)
        h = propagate(h)
        return h


class MXMLocalMP(nn.Module):
    """mxmnet_conv.py:86 — local track with two directional mixings.

    ``h_mlp`` is shared between the entry transform and the update
    (reference double-assignment quirk). Output head ``y_W`` is
    zero-initialised by default so early training is dominated by the
    global track, as in the reference.
    """

    units: int = 64
    output_units: int = 1
    activation: str = "swish"
    output_kernel_initializer: str = "zeros"
    pooling_method: str = "sum"

    @nn.compact
    def __call__(self, batch: GraphBatch, h: Array, rbf: Array,
                 sbf1: Array, sbf2: Array):
        act = self.activation
        u = self.units
        e = batch.n_edge
        n = batch.n_node
        h_mlp = Dense(u, activation=act, name="h_mlp")  # shared, see docstring

        def _pool_pairs(values: Array, pairs: Array, mask: Array) -> Array:
            w = mask[:, None].astype(values.dtype)
            out = segment_sum(values * w, pairs[:, 0], e)
            if self.pooling_method == "mean":
                cnt = segment_sum(mask.astype(values.dtype), pairs[:, 0], e)
                out = out / jnp.maximum(cnt, 1.0)[:, None]
            return out

        res_h = h
        h = h_mlp(h)

        hi = jnp.take(h, batch.receivers, axis=0)
        hj = jnp.take(h, batch.senders, axis=0)
        m = jnp.concatenate([hi, hj, rbf], axis=-1)

        # Message passing 1: mixing over angle pairing (ij, jk).
        m_kj = Dense(u, activation=act, name="mlp_kj")(m)
        m_kj = m_kj * Dense(u, activation="linear", use_bias=False,
                            name="lin_rbf1")(rbf)
        m_kj = jnp.take(m_kj, batch.angle_edges[:, 1], axis=0)
        m_kj = m_kj * MLP([u, u], activation=act, name="mlp_sbf1")(sbf1)
        m_kj = _pool_pairs(m_kj, batch.angle_edges, batch.angle_edge_mask)
        m_ji_1 = Dense(u, activation=act, name="mlp_ji_1")(m)
        m = m_ji_1 + m_kj

        # Message passing 2: mixing over angle pairing (ij, ik).
        m_jj = Dense(u, activation=act, name="mlp_jj")(m)
        m_jj = m_jj * Dense(u, activation="linear", use_bias=False,
                            name="lin_rbf2")(rbf)
        m_jj = jnp.take(m_jj, batch.angle_edges_2[:, 1], axis=0)
        m_jj = m_jj * MLP([u, u], activation=act, name="mlp_sbf2")(sbf2)
        m_jj = _pool_pairs(m_jj, batch.angle_edges_2, batch.angle_edge_mask_2)
        m_ji_2 = Dense(u, activation=act, name="mlp_ji_2")(m)
        m = m_ji_2 + m_jj

        # Aggregate messages onto receiving nodes.
        m = Dense(u, activation="linear", use_bias=False,
                  name="lin_rbf_out")(rbf) * m
        w = batch.edge_mask[:, None].astype(m.dtype)
        agg = segment_sum(m * w, batch.receivers, n)
        if self.pooling_method == "mean":
            cnt = segment_sum(batch.edge_mask.astype(m.dtype),
                              batch.receivers, n)
            agg = agg / jnp.maximum(cnt, 1.0)[:, None]
        h = agg

        # Update function f_u.
        h = ResidualLayer(u, name="res1")(h)
        h = h_mlp(h)
        h = h + res_h
        h = ResidualLayer(u, name="res2")(h)
        h = ResidualLayer(u, name="res3")(h)

        # Output module.
        y = MLP([u, u, u], activation=act, name="y_mlp")(h)
        out_init = nn.initializers.zeros \
            if self.output_kernel_initializer == "zeros" \
            else nn.initializers.glorot_uniform()
        y = Dense(self.output_units, activation="linear",
                  kernel_init=out_init, name="y_W")(y)
        return h, y


class MXMNet(nn.Module):
    config: Dict[str, Any]

    @nn.compact
    def __call__(self, batch: GraphBatch, train: bool = False) -> Dict[str, Array]:
        cfg = self.config
        assert batch.angle_edges is not None and batch.angle_edges_2 is not None, \
            "MXMNet needs both angle-pair lists (set_angle_pairs_kgcnn 'jk' + " \
            "'ik' with allow_self_edges, batched via angle_edge_index_key(_2))"
        pos = batch.nodes["node_coordinates"]
        z = batch.nodes.get("node_number")
        x = batch.nodes.get("node_attributes", z)

        # EmbeddingDimeBlock (dimenet_conv.py:328): RandomUniform(+-sqrt(3)).
        emb_cfg = cfg["input_embedding"]["node"]
        if x.ndim == 1:
            # reference EmbeddingDimeBlock table is (input_dim + 1, out)
            # (dimenet_conv.py:359)
            emb = nn.Embed(
                emb_cfg["input_dim"] + 1, emb_cfg["output_dim"],
                embedding_init=lambda key, shape, dtype: jax.random.uniform(
                    key, shape, dtype, -_SQRT3, _SQRT3),
                name="embed_z")
            h = emb(x.astype(jnp.int32))
        else:
            h = x

        # Local (bond) graph geometry: v12 = x_receiver - x_sender.
        vec = jnp.take(pos, batch.receivers, axis=0) \
            - jnp.take(pos, batch.senders, axis=0)
        d_l = jnp.sqrt(jnp.maximum(jnp.sum(vec * vec, axis=-1), 1e-12))
        bbl = cfg["bessel_basis_local"]
        rbf_l = bessel_basis_kgcnn(
            d_l[:, None], num_radial=bbl["num_radial"], cutoff=bbl["cutoff"],
            envelope_exponent=bbl.get("envelope_exponent", 5))
        rbf_l = rbf_l * batch.edge_mask[:, None].astype(rbf_l.dtype)

        # Angles over the two pair lists. Pairing 2 negates the second
        # vector (EdgeAngle(vector_scale=[1,-1]), MXMNet.py:147), i.e.
        # cos(alpha_2) = -cos(angle(v[a], v[b])).
        def _cos(pairs: Array, flip: bool) -> Array:
            v1 = jnp.take(vec, pairs[:, 0], axis=0)
            v2 = jnp.take(vec, pairs[:, 1], axis=0)
            if flip:
                v2 = -v2
            num = jnp.sum(v1 * v2, axis=-1)
            # guarded norms: padding pairs reference zero vectors, and
            # d||v||/dv at v=0 is NaN which survives the later 0-mask in
            # the backward pass (0 * NaN = NaN) — grad-safe sqrt(max(., eps))
            n1 = jnp.sqrt(jnp.maximum(jnp.sum(v1 * v1, axis=-1), 1e-12))
            n2 = jnp.sqrt(jnp.maximum(jnp.sum(v2 * v2, axis=-1), 1e-12))
            return jnp.clip(num / (n1 * n2), -1.0, 1.0)

        sph = cfg["spherical_basis_local"]
        sbl = SphericalBasisLayer(
            sph["num_spherical"], sph["num_radial"], sph["cutoff"],
            sph.get("envelope_exponent", 5), name="sbf_layer")
        cos1 = _cos(batch.angle_edges, flip=False)
        sbf1 = sbl(d_l[batch.angle_edges[:, 1]], cos1)
        sbf1 = sbf1 * batch.angle_edge_mask[:, None].astype(sbf1.dtype)
        cos2 = _cos(batch.angle_edges_2, flip=True)
        sbf2 = sbl(d_l[batch.angle_edges_2[:, 1]], cos2)
        sbf2 = sbf2 * batch.angle_edge_mask_2[:, None].astype(sbf2.dtype)

        # Global (range) graph: SECOND edge set; falls back to the primary
        # set when a batch carries only one edge set.
        if batch.senders2 is not None:
            snd_g, rcv_g = batch.senders2, batch.receivers2
            mask_g = batch.edge2_mask
        else:
            snd_g, rcv_g = batch.senders, batch.receivers
            mask_g = batch.edge_mask
        vec_g = jnp.take(pos, rcv_g, axis=0) - jnp.take(pos, snd_g, axis=0)
        d_g = jnp.sqrt(jnp.maximum(jnp.sum(vec_g * vec_g, axis=-1), 1e-12))
        bbg = cfg["bessel_basis_global"]
        rbf_g = bessel_basis_kgcnn(
            d_g[:, None], num_radial=bbg["num_radial"], cutoff=bbg["cutoff"],
            envelope_exponent=bbg.get("envelope_exponent", 5))
        rbf_g = rbf_g * mask_g[:, None].astype(rbf_g.dtype)

        if cfg.get("use_edge_attributes") and "edge_attributes" in batch.edges:
            rbf_l = jnp.concatenate(
                [rbf_l, batch.edges["edge_attributes"]], axis=-1)

        rk = cfg["mlp_rbf_kwargs"]
        sk = cfg["mlp_sbf_kwargs"]
        rbf_l = MLP(rk["units"], activation=rk["activation"],
                    name="mlp_rbf_l")(rbf_l)
        sbf1 = MLP(sk["units"], activation=sk["activation"],
                   name="mlp_sbf_1")(sbf1)
        sbf2 = MLP(sk["units"], activation=sk["activation"],
                   name="mlp_sbf_2")(sbf2)
        rbf_g = MLP(rk["units"], activation=rk["activation"],
                    name="mlp_rbf_g")(rbf_g)

        t_sum = 0.0
        for i in range(cfg["depth"]):
            h = MXMGlobalMP(**cfg["global_mp_kwargs"],
                            name=f"global_{i}")(batch, h, rbf_g,
                                                snd_g, rcv_g, mask_g)
            h, t = MXMLocalMP(**cfg["local_mp_kwargs"],
                              name=f"local_{i}")(batch, h, rbf_l, sbf1, sbf2)
            t_sum = t_sum + t

        out = t_sum * batch.node_mask[:, None].astype(h.dtype)
        if cfg["output_embedding"] == "graph":
            out = pool_nodes_to_graph(batch, out, **cfg["node_pooling_args"])
            if cfg.get("use_output_mlp", True):
                om = cfg["output_mlp"]
                out = MLP(om["units"], activation=om["activation"],
                          use_bias=om.get("use_bias", True),
                          name="output_mlp")(out)
        else:
            if cfg.get("use_output_mlp", True):
                om = cfg["output_mlp"]
                out = MLP(om["units"], activation=om["activation"],
                          use_bias=om.get("use_bias", True),
                          name="output_mlp")(out)
        return {"output": out}


def make_model(**kwargs) -> MXMNet:
    cfg = update_model_kwargs(model_default, kwargs)
    return MXMNet(config=cfg)
