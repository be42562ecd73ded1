"""Weighted ACSF (wACSF) — element-weighted symmetry functions without
per-pair parameter tables (Gastegger et al. 2017).

Parity with ``kgcnn/layers/conv/wacsf_conv.py:97`` (wACSFRad) and ``:217``
(wACSFAng): weight g(Z_j) = Z_j (radial) and h(Z_j, Z_k) = Z_j Z_k (angular),
parameters indexed by the CENTRAL atom's atomic number, plain edge-sum
pooling, 2^(1-zeta) scale applied after pooling.

Default parameter grids are the unoptimized-C defaults of the reference
(22 radial / 10 angular sets, identical for every element; the reference
additionally ships optimized rows for H/C/N/O/F which can be passed in via
``eta_mu`` / ``eta_mu_lambda_zeta``).
"""
from __future__ import annotations

import math
from typing import Any, Optional

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from ...batch import GraphBatch
from ...ops.segment import segment_sum

Array = jax.Array

_N_ELEM = 118


def default_radial_eta_mu() -> np.ndarray:
    """(118, 22, 2) (eta, mu) table (wacsf_conv.py:15): generic grid for all
    elements, overridden with the published optimized rows for H/C/N/O/F."""
    from .wacsf_params import RADIAL_OPT
    mus = np.linspace(7.5, 0.5, 22)
    table = np.stack([np.full(22, 4.5), mus], axis=-1)
    out = np.broadcast_to(table, (_N_ELEM, 22, 2)).copy()
    for z, rows in RADIAL_OPT.items():
        out[z] = np.array(rows)[:, :2]
    return out


def default_angular_params() -> np.ndarray:
    """(118, 10, 4) (eta, mu, lambda, zeta) table (wacsf_conv.py:23) with
    optimized H/C/N/O/F rows."""
    from .wacsf_params import ANGULAR_OPT
    etas = [0.0330612, 0.0330612, 0.0498615, 0.0498615, 0.0836777,
            0.0836777, 0.1685744, 0.1685744, 0.5, 0.5]
    lambdas = [-1.0, 1.0] * 5
    table = np.stack([np.array(etas), np.zeros(10), np.array(lambdas),
                      np.ones(10)], axis=-1)
    out = np.broadcast_to(table, (_N_ELEM, 10, 4)).copy()
    for z, rows in ANGULAR_OPT.items():
        out[z] = np.array(rows)[:, :4]
    return out


def _fc(r: Array, cutoff: float) -> Array:
    rc = jnp.clip(r, -cutoff, cutoff)
    return 0.5 * (jnp.cos(rc * math.pi / cutoff) + 1.0)


class wACSFRad(nn.Module):
    """W_i = sum_j Z_j exp(-eta(r_ij - mu)^2) f_c(r_ij). Output (N, m)."""

    eta_mu: Any = None
    cutoff: float = 8.0

    @nn.compact
    def __call__(self, batch: GraphBatch, z: Optional[Array] = None,
                 positions: Optional[Array] = None,
                 external_weights: Optional[Array] = None) -> Array:
        table = np.asarray(self.eta_mu, dtype=np.float32) if self.eta_mu is not None \
            else default_radial_eta_mu().astype(np.float32)
        table = table[..., :2]
        tab = jnp.asarray(table)
        z = z if z is not None else batch.nodes["node_number"].astype(jnp.int32)
        pos = positions if positions is not None else batch.nodes["node_coordinates"]
        recv, send = batch.receivers, batch.senders

        vec = pos[recv] - pos[send]
        rij = jnp.sqrt(jnp.maximum(jnp.sum(vec * vec, axis=-1, keepdims=True), 1e-12))
        params = tab[jnp.clip(z[recv], 0, _N_ELEM - 1)]  # central atom params (E, m, 2)
        eta, mu = params[..., 0], params[..., 1]
        gij = jnp.exp(-eta * (rij - mu) ** 2)
        w = external_weights if external_weights is not None \
            else z[send].astype(gij.dtype)[:, None]
        rep = gij * _fc(rij, self.cutoff) * w
        rep = rep * batch.edge_mask[:, None].astype(rep.dtype)
        return segment_sum(rep, recv, batch.n_node, indices_are_sorted=True)


class wACSFAng(nn.Module):
    """W_i = 2^(1-zeta) sum_jk Z_j Z_k (1+lambda cos)^zeta
    exp(-eta((r_ij-mu)^2+(r_ik-mu)^2+(r_jk-mu)^2)) f_ij f_ik f_jk.
    Output (N, m)."""

    eta_mu_lambda_zeta: Any = None
    cutoff: float = 8.0

    @nn.compact
    def __call__(self, batch: GraphBatch, z: Optional[Array] = None,
                 positions: Optional[Array] = None,
                 external_weights: Optional[Array] = None) -> Array:
        assert batch.angles is not None, "wACSFAng needs angle triples"
        table = np.asarray(self.eta_mu_lambda_zeta, dtype=np.float32) \
            if self.eta_mu_lambda_zeta is not None \
            else default_angular_params().astype(np.float32)
        table = table[..., :4]
        tab = jnp.asarray(table)
        z = z if z is not None else batch.nodes["node_number"].astype(jnp.int32)
        pos = positions if positions is not None else batch.nodes["node_coordinates"]
        i, j, k = batch.angles[:, 0], batch.angles[:, 1], batch.angles[:, 2]

        params = tab[jnp.clip(z[i], 0, _N_ELEM - 1)]  # (A, m, 4)
        eta, mu, lamda, zeta = (params[..., 0], params[..., 1],
                                params[..., 2], params[..., 3])
        vij, vik, vjk = pos[j] - pos[i], pos[k] - pos[i], pos[k] - pos[j]

        def dist(v):
            return jnp.sqrt(jnp.maximum(jnp.sum(v * v, axis=-1, keepdims=True), 1e-12))

        rij, rik, rjk = dist(vij), dist(vik), dist(vjk)
        g = jnp.exp(-eta * ((rij - mu) ** 2 + (rik - mu) ** 2 + (rjk - mu) ** 2))
        cos_theta = jnp.sum(vij * vik, axis=-1, keepdims=True) / rij / rik
        cos_term = jnp.power(jnp.maximum(cos_theta * lamda + 1.0, 1e-30), zeta)
        w = external_weights if external_weights is not None \
            else (z[j] * z[k]).astype(g.dtype)[:, None]
        rep = cos_term * g * _fc(rij, self.cutoff) * _fc(rik, self.cutoff) \
            * _fc(rjk, self.cutoff) * w
        rep = rep * batch.angle_mask[:, None].astype(rep.dtype)
        # angles are sorted by center node at batch build -> Pallas fast path
        pooled = segment_sum(rep, i, batch.n_node, indices_are_sorted=True)
        # post-pool 2^(1-zeta) scale uses the central atom's zeta table
        zeta_n = tab[jnp.clip(z, 0, _N_ELEM - 1)][..., 3]
        return jnp.power(2.0, 1.0 - zeta_n) * pooled
