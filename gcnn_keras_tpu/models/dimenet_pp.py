"""DimeNet++ (parity: ``kgcnn/literature/DimeNetPP.py`` make_model; blocks at
``kgcnn/layers/conv/dimenet_conv.py:13,80,231,328,380``).

Directional message passing on edges with a joint spherical-radial basis of
(distance, angle) between edge pairs; interaction blocks mix messages over
the ``angle_edges`` pair list; per-block output heads project messages onto
receiving nodes and are summed.
"""
from __future__ import annotations

import math
from typing import Any, Dict

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from ..batch import GraphBatch
from ..layers.aggr import gather_nodes, pool_edges_to_nodes, pool_nodes_to_graph
from ..layers.geometry import polynomial_envelope
from ..layers.mlp import Dense, MLP
from ..ops.polynom import (
    spherical_bessel_jn_all, legendre_pn_all, spherical_bessel_zeros,
)
from ..ops.segment import segment_sum
from ..ops.initializers import glorot_orthogonal
from .common import OptionalInputEmbedding
from .registry import update_model_kwargs

Array = jax.Array

model_default = dict(
    input_embedding={"node": {"input_dim": 95, "output_dim": 128}},
    emb_size=128, out_emb_size=256, int_emb_size=64, basis_emb_size=8,
    num_blocks=4, num_spherical=7, num_radial=6,
    cutoff=5.0, envelope_exponent=5,
    num_before_skip=1, num_after_skip=2, num_dense_output=3,
    num_targets=1, activation="swish",
    extensive=True, output_init="zeros",
    output_embedding="graph",
    output_mlp={},
)


def _sbf_constants(num_spherical: int, num_radial: int):
    """Normalization of the spherical basis: first num_radial zeros z_ln of
    j_l and norm sqrt(2 / (c^3 j_{l+1}(z_ln)^2)) (c=1 scaled)."""
    from scipy.special import spherical_jn
    zeros = spherical_bessel_zeros(num_spherical, num_radial)  # (L, n)
    norms = np.zeros_like(zeros)
    for l in range(num_spherical):
        for n in range(num_radial):
            norms[l, n] = math.sqrt(2.0) / abs(spherical_jn(l + 1, zeros[l, n]))
    return zeros.astype(np.float32), norms.astype(np.float32)


class SphericalBasisLayer(nn.Module):
    """(dimenet_conv.py:380) joint basis sbf_{ln}(d_kj, alpha) per angle pair."""

    num_spherical: int = 7
    num_radial: int = 6
    cutoff: float = 5.0
    envelope_exponent: int = 5

    @nn.compact
    def __call__(self, d_kj: Array, cos_alpha: Array) -> Array:
        zeros, norms = _sbf_constants(self.num_spherical, self.num_radial)
        zeros_t = jnp.asarray(zeros)   # (L, n)
        norms_t = jnp.asarray(norms)
        rho = d_kj / self.cutoff  # (A,)
        # reference SBL envelope (dimenet_conv.py envelope()): with
        # p = exponent + 1, env(u) = 1/u + a u^{p-1} + b u^p + c u^{p+1},
        # zeroed beyond the cutoff — NOT the 1 + ... smooth variant
        pe = self.envelope_exponent + 1
        a = -(pe + 1) * (pe + 2) / 2.0
        bco = float(pe * (pe + 2))
        c = -pe * (pe + 1) / 2.0
        safe = jnp.maximum(rho, 1e-12)
        env = 1.0 / safe + a * safe ** (pe - 1) + bco * safe ** pe \
            + c * safe ** (pe + 1)
        env = jnp.where(rho < 1.0, env, 0.0)
        # radial: j_l(z_ln * rho) — evaluate per (l, n)
        arg = rho[:, None, None] * zeros_t[None, :, :]  # (A, L, n)
        L = self.num_spherical
        rad = jnp.stack(
            [spherical_bessel_jn_all(arg[:, l, :], L)[..., l] for l in range(L)],
            axis=1)  # (A, L, n)
        rad = rad * norms_t[None]
        ang = legendre_pn_all(cos_alpha, L)  # (A, L)
        # reference uses m=0 spherical harmonics Y_l (polynom.py:117):
        # Y_l = sqrt((2l+1)/(4 pi)) P_l(cos theta) — apply the per-l factor
        import math as _math
        yl_scale = jnp.asarray(
            [_math.sqrt((2 * l + 1) / (4 * _math.pi)) for l in range(L)],
            dtype=ang.dtype)
        ang = ang * yl_scale[None, :]
        out = rad * ang[:, :, None] * env[:, None, None]
        return out.reshape(-1, L * self.num_radial)


class ResidualLayer(nn.Module):
    units: int
    activation: Any = "swish"

    @nn.compact
    def __call__(self, x: Array) -> Array:
        init = glorot_orthogonal()
        h = Dense(self.units, activation=self.activation, kernel_init=init,
                  name="dense_1")(x)
        h = Dense(self.units, activation=self.activation, kernel_init=init,
                  name="dense_2")(h)
        return x + h


class DimNetInteractionPPBlock(nn.Module):
    emb_size: int = 128
    int_emb_size: int = 64
    basis_emb_size: int = 8
    num_before_skip: int = 1
    num_after_skip: int = 2
    activation: Any = "swish"

    @nn.compact
    def __call__(self, batch: GraphBatch, m: Array, rbf: Array, sbf: Array) -> Array:
        init = glorot_orthogonal()
        act = self.activation
        rbf_ = Dense(self.basis_emb_size, activation="linear", use_bias=False,
                     kernel_init=init, name="rbf_1")(rbf)
        rbf_ = Dense(self.emb_size, activation="linear", use_bias=False,
                     kernel_init=init, name="rbf_2")(rbf_)
        sbf_ = Dense(self.basis_emb_size, activation="linear", use_bias=False,
                     kernel_init=init, name="sbf_1")(sbf)
        sbf_ = Dense(self.int_emb_size, activation="linear", use_bias=False,
                     kernel_init=init, name="sbf_2")(sbf_)

        x_ji = Dense(self.emb_size, activation=act, kernel_init=init,
                     name="ji")(m)
        x_kj = Dense(self.emb_size, activation=act, kernel_init=init,
                     name="kj")(m)
        x_kj = x_kj * rbf_
        x_kj = Dense(self.int_emb_size, activation=act, use_bias=False,
                     kernel_init=init, name="down")(x_kj)
        # directional mixing over angle pairs: gather the DOWN-projected
        # messages at adi[:, 1] and aggregate onto adi[:, 0] (reference
        # dimenet_conv.py: GatherNodesOutgoing + PoolingLocalEdges on the
        # angle index list)
        e1 = batch.angle_edges[:, 0]
        e2 = batch.angle_edges[:, 1]
        mix = jnp.take(x_kj, e2, axis=0) * sbf_
        mix = mix * batch.angle_edge_mask[:, None].astype(mix.dtype)
        agg = segment_sum(mix, e1, batch.n_edge)
        x_kj = Dense(self.emb_size, activation=act, use_bias=False,
                     kernel_init=init, name="up")(agg)

        m2 = x_ji + x_kj
        for i in range(self.num_before_skip):
            m2 = ResidualLayer(self.emb_size, activation=act,
                               name=f"res_before_{i}")(m2)
        m = m + Dense(self.emb_size, activation=act, kernel_init=init,
                      name="skip")(m2)
        for i in range(self.num_after_skip):
            m = ResidualLayer(self.emb_size, activation=act,
                              name=f"res_after_{i}")(m)
        return m


class DimNetOutputBlock(nn.Module):
    emb_size: int = 128
    out_emb_size: int = 256
    num_dense: int = 3
    num_targets: int = 1
    activation: Any = "swish"
    output_init: str = "zeros"

    @nn.compact
    def __call__(self, batch: GraphBatch, m: Array, rbf: Array) -> Array:
        init = glorot_orthogonal()
        g = Dense(self.emb_size, activation="linear", use_bias=False,
                  kernel_init=init, name="rbf")(rbf)
        x = g * m
        x = pool_edges_to_nodes(batch, x, mode="sum")
        x = Dense(self.out_emb_size, activation="linear", use_bias=False,
                  kernel_init=init, name="up")(x)
        for i in range(self.num_dense):
            x = Dense(self.out_emb_size, activation=self.activation,
                      kernel_init=init, name=f"dense_{i}")(x)
        out_init = nn.initializers.zeros if self.output_init == "zeros" \
            else glorot_orthogonal()
        x = Dense(self.num_targets, activation="linear", use_bias=False,
                  kernel_init=out_init, name="out")(x)
        return x


class DimeNetPP(nn.Module):
    config: Dict[str, Any]

    @nn.compact
    def __call__(self, batch: GraphBatch, train: bool = False) -> Dict[str, Array]:
        cfg = self.config
        assert batch.angle_edges is not None, \
            "DimeNetPP needs angle_edges (set_angle_edge_pairs + batch support)"
        act = cfg["activation"]
        z = batch.nodes["node_number"].astype(jnp.int32)
        pos = batch.nodes["node_coordinates"]

        vec = pos[batch.receivers] - pos[batch.senders]
        d = jnp.sqrt(jnp.maximum(jnp.sum(vec * vec, axis=-1), 1e-12))  # (E,)
        rho = d / cfg["cutoff"]
        from ..layers.geometry import bessel_basis_kgcnn
        rbf = bessel_basis_kgcnn(d[:, None], num_radial=cfg["num_radial"],
                                 cutoff=cfg["cutoff"],
                                 envelope_exponent=cfg["envelope_exponent"])
        rbf = rbf * batch.edge_mask[:, None].astype(rbf.dtype)

        # angle per edge pair, reference convention (EdgeAngle geom.py:450):
        # angle between v12[adi0] and v12[adi1] with v12 = x_recv - x_send;
        # sbf distance gathered at adi[:, 1]
        e1, e2 = batch.angle_edges[:, 0], batch.angle_edges[:, 1]
        v1 = vec[e1]
        v2 = vec[e2]
        num = jnp.sum(v1 * v2, axis=-1)
        # grad-safe norms: padding pairs hold zero vectors and d||v||/dv at
        # v=0 is NaN, which the later 0-mask cannot remove from the
        # backward pass (0 * NaN = NaN)
        nv1 = jnp.sqrt(jnp.maximum(jnp.sum(v1 * v1, axis=-1), 1e-12))
        nv2 = jnp.sqrt(jnp.maximum(jnp.sum(v2 * v2, axis=-1), 1e-12))
        cos_alpha = jnp.clip(num / (nv1 * nv2), -1.0, 1.0)
        d_kj = d[e2]
        sbf = SphericalBasisLayer(cfg["num_spherical"], cfg["num_radial"],
                                  cfg["cutoff"], cfg["envelope_exponent"],
                                  name="sbf")(d_kj, cos_alpha)
        sbf = sbf * batch.angle_edge_mask[:, None].astype(sbf.dtype)

        # embedding block (dimenet_conv.py:328; keras default init
        # 'uniform' = U(-0.05, 0.05), dimenet_conv.py:343)
        emb = nn.Embed(cfg["input_embedding"]["node"]["input_dim"],
                       cfg["emb_size"],
                       embedding_init=lambda key, shape, dtype=jnp.float32:
                           jax.random.uniform(key, shape, dtype, -0.05, 0.05),
                       name="embed_z")
        hz = emb(z)
        h_i = jnp.take(hz, batch.receivers, axis=0)
        h_j = jnp.take(hz, batch.senders, axis=0)
        rbf_emb = Dense(cfg["emb_size"], activation=act, name="embed_rbf")(rbf)
        # reference concat order: GatherNodes -> [n_i, n_j], then rbf
        m = Dense(cfg["emb_size"], activation=act, name="embed_out")(
            jnp.concatenate([h_i, h_j, rbf_emb], axis=-1))

        out_sum = DimNetOutputBlock(
            cfg["emb_size"], cfg["out_emb_size"], cfg["num_dense_output"],
            cfg["num_targets"], activation=act, output_init=cfg["output_init"],
            name="output_0")(batch, m, rbf)
        for b in range(cfg["num_blocks"]):
            m = DimNetInteractionPPBlock(
                cfg["emb_size"], cfg["int_emb_size"], cfg["basis_emb_size"],
                cfg["num_before_skip"], cfg["num_after_skip"], activation=act,
                name=f"interaction_{b}")(batch, m, rbf, sbf)
            out_sum = out_sum + DimNetOutputBlock(
                cfg["emb_size"], cfg["out_emb_size"], cfg["num_dense_output"],
                cfg["num_targets"], activation=act, output_init=cfg["output_init"],
                name=f"output_{b + 1}")(batch, m, rbf)

        nodes_out = out_sum * batch.node_mask[:, None].astype(out_sum.dtype)
        if cfg["output_embedding"] == "graph":
            mode = "sum" if cfg["extensive"] else "mean"
            out = pool_nodes_to_graph(batch, nodes_out, mode=mode)
        else:
            out = nodes_out
        if cfg.get("use_output_mlp", True) and cfg.get("output_mlp"):
            out = MLP(cfg["output_mlp"]["units"],
                      activation=cfg["output_mlp"]["activation"],
                      use_bias=cfg["output_mlp"].get("use_bias", True),
                      name="output_mlp")(out)
        return {"output": out}


def make_model(**kwargs) -> DimeNetPP:
    cfg = update_model_kwargs(model_default, kwargs)
    return DimeNetPP(config=cfg)


def make_crystal_model(**kwargs) -> DimeNetPP:
    return make_model(**kwargs)
