"""Geometric edge features: distances, bases, cutoffs, angles, periodic cells.

TPU-native re-design of ``kgcnn/layers/geom.py`` — plain jit-friendly
functions over the flat GraphBatch instead of ragged Keras layers. All
shapes static; every op fuses into the surrounding XLA graph.
"""
from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..batch import GraphBatch

Array = jax.Array


def edge_vectors(batch: GraphBatch, positions: Optional[Array] = None,
                 key: str = "node_coordinates") -> Array:
    """Displacement vector per edge: x_recv - x_send, ``(E, 3)``.

    (NodePosition + subtract, ``kgcnn/layers/geom.py:14,285``.) For periodic
    systems, adds the lattice image shift from ``edges['range_image']`` and
    ``globals['graph_lattice']`` (ShiftPeriodicLattice, ``geom.py:76``).
    """
    pos = positions if positions is not None else batch.nodes[key]
    if batch.part_axis is not None:
        # edge-partitioned shard: senders index the halo-exchanged table
        from ..batch import sender_node_table
        pos_j = jnp.take(sender_node_table(batch, pos), batch.senders, axis=0)
        pos_i = pos[batch.receivers]
    else:
        # route the TRANSPOSE (the d_pos scatter-add every force/loss
        # traversal runs) through the sorted Pallas segment-sum — the r5
        # SchNet profile showed the plain-indexing backward costing
        # ~0.4-0.5 ms per traversal at 512-mol shapes (auto-gated at
        # >=16k edges inside gather_with_sorted_transpose)
        from ..ops.pallas.fused_aggregate import gather_with_sorted_transpose
        perm = batch.edges.get("sender_perm")
        # no perm recorded -> senders are NOT known-sorted; a sorted
        # segment-sum transpose would silently mis-aggregate d_pos
        # (same guard as aggr.gather_sender_nodes)
        pos_j = gather_with_sorted_transpose(pos, batch.senders, perm) \
            if perm is not None else pos[batch.senders]
        pos_i = gather_with_sorted_transpose(pos, batch.receivers)
    vec = pos_i - pos_j
    if "range_image" in batch.edges and "graph_lattice" in batch.globals:
        image = batch.edges["range_image"].astype(pos.dtype)  # (E, 3)
        lattice = batch.globals["graph_lattice"]  # (G, 3, 3) row vectors
        lat_e = lattice[batch.edge_graph_id]  # (E, 3, 3)
        # the image shifts the SENDER: d = x_i - (x_j + s @ L), matching the
        # reference convention (ShiftPeriodicLattice geom.py:76,
        # DisplacementVectorsUnitCell geom.py:964) so reference-preprocessed
        # range_image arrays work unchanged
        vec = vec - jnp.einsum("ei,eij->ej", image, lat_e)
    return vec


def edge_distances(batch: GraphBatch, positions: Optional[Array] = None,
                   eps: float = 1e-12) -> Array:
    """Euclidean edge length ``(E, 1)`` (NodeDistanceEuclidean, geom.py:285).

    Uses a masked sqrt so padding edges (zero vector) have zero distance and
    finite gradients — critical because forces differentiate through this.
    """
    vec = edge_vectors(batch, positions)
    d2 = jnp.sum(vec * vec, axis=-1, keepdims=True)
    safe = jnp.maximum(d2, eps)
    d = jnp.sqrt(safe)
    return jnp.where(d2 > eps, d, jnp.sqrt(eps))


def edge_directions(batch: GraphBatch, positions: Optional[Array] = None,
                    eps: float = 1e-12) -> Tuple[Array, Array]:
    """Normalized edge direction + distance (EdgeDirectionNormalized,
    geom.py:331). Returns ``((E,3), (E,1))``."""
    vec = edge_vectors(batch, positions)
    d2 = jnp.sum(vec * vec, axis=-1, keepdims=True)
    d = jnp.sqrt(jnp.maximum(d2, eps))
    return vec / d, jnp.where(d2 > eps, d, 0.0)


def gauss_basis(distance: Array, bins: int = 20, distance_max: float = 4.0,
                offset: float = 0.0, sigma: float = 0.4) -> Array:
    """Gaussian radial basis expansion (GaussBasisLayer, geom.py:514).

    ``distance``: (E, 1) -> (E, bins). Exact reference semantics
    (geom.py:554-571): centers ``arange(bins)/bins * distance_max`` (endpoint
    excluded), input shifted by ``offset``, gamma = 1/(2 sigma^2).
    """
    gamma = -0.5 / (sigma * sigma)
    centers = (jnp.arange(bins, dtype=distance.dtype) / float(bins)
               * distance_max)
    diff = (distance - offset) - centers[None, :]
    return jnp.exp(gamma * diff * diff)


def bessel_basis(distance: Array, num_radial: int = 20, cutoff: float = 5.0,
                 envelope: bool = False, exponent: int = 5) -> Array:
    """Bessel radial basis sqrt(2/c) sin(n pi d / c) / d (BesselBasisLayer,
    geom.py:717 / DimeNet eq. 7). ``distance``: (E,1) -> (E, num_radial)."""
    d = jnp.maximum(distance, 1e-8)
    n = jnp.arange(1, num_radial + 1, dtype=distance.dtype)
    arg = n[None, :] * (math.pi / cutoff) * d
    rbf = math.sqrt(2.0 / cutoff) * jnp.sin(arg) / d
    if envelope:
        rbf = rbf * polynomial_envelope(distance / cutoff, exponent)
    return rbf


def bessel_basis_kgcnn(distance: Array, num_radial: int = 20,
                       cutoff: float = 5.0, envelope_exponent: int = 5) -> Array:
    """EXACT reference composition (BesselBasisLayer, geom.py:772-785):
    ``env(u) * sin(n pi u)`` with ``u = d/c`` and
    ``env(u) = 1/u + a u^p + b u^(p+1) + c u^(p+2)`` for p = exponent+1 —
    i.e. the 1/d factor rides inside the envelope and there is NO sqrt(2/c)
    normalization. Verified against the reference's stored golden arrays
    (test/assets/bessel_basis_reference.npz)."""
    u = distance / cutoff
    n = jnp.arange(1, num_radial + 1, dtype=distance.dtype) * math.pi
    env = polynomial_envelope(u, envelope_exponent + 1) / jnp.maximum(u, 1e-8)
    return env * jnp.sin(n[None, :] * u)


def polynomial_envelope(u: Array, p: int = 5) -> Array:
    """DimeNet C^p smooth polynomial envelope on u in [0,1]:
    1 - (p+1)(p+2)/2 u^p + p(p+2) u^{p+1} - p(p+1)/2 u^{p+2}; zero beyond."""
    a = -(p + 1) * (p + 2) / 2.0
    b = float(p * (p + 2))
    c = -p * (p + 1) / 2.0
    env = 1.0 + a * u**p + b * u ** (p + 1) + c * u ** (p + 2)
    return jnp.where(u < 1.0, env, 0.0)


def cosine_cutoff_envelope(distance: Array, cutoff: float) -> Array:
    """f_c(r) = 0.5 (cos(pi r / r_c) + 1) for r < r_c else 0
    (CosCutOffEnvelope, geom.py:809 — the Behler cutoff)."""
    fc = 0.5 * (jnp.cos(math.pi * distance / cutoff) + 1.0)
    return jnp.where(distance < cutoff, fc, 0.0)


def cosine_cutoff(values: Array, distance: Array, cutoff: float) -> Array:
    """Multiply values by the cosine cutoff (CosCutOff, geom.py:860)."""
    return values * cosine_cutoff_envelope(distance, cutoff)


def fourier_basis(distance: Array, bins: int = 20, distance_max: float = 4.0) -> Array:
    """Positional-encoding-style basis (PositionEncodingBasisLayer, geom.py:596)."""
    k = jnp.arange(bins, dtype=distance.dtype)
    freq = math.pi / distance_max * (k // 2 + 1)
    arg = distance * freq[None, :]
    even = jnp.sin(arg)
    odd = jnp.cos(arg)
    return jnp.where((k % 2 == 0)[None, :], even, odd)


def frac_to_real_coordinates(batch: GraphBatch, frac: Optional[Array] = None,
                             lattice_key: str = "graph_lattice") -> Array:
    """Fractional -> cartesian per node using each graph's lattice
    (FracToRealCoordinates, kgcnn/layers/geom.py:1012)."""
    f = frac if frac is not None else batch.nodes["node_coordinates"]
    lat = batch.globals[lattice_key][batch.graph_id]  # (N, 3, 3) rows = vectors
    return jnp.einsum("ni,nij->nj", f, lat)


def real_to_frac_coordinates(batch: GraphBatch, cart: Optional[Array] = None,
                             lattice_key: str = "graph_lattice") -> Array:
    """Cartesian -> fractional (inverse of frac_to_real_coordinates)."""
    x = cart if cart is not None else batch.nodes["node_coordinates"]
    lat = batch.globals[lattice_key]  # (G, 3, 3)
    inv = jnp.linalg.inv(lat)[batch.graph_id]
    return jnp.einsum("ni,nij->nj", x, inv)


def displacement_vectors_unit_cell(batch: GraphBatch,
                                   positions: Optional[Array] = None) -> Array:
    """Edge displacement with minimum-image periodic shift from
    ``range_image`` (DisplacementVectorsUnitCell, geom.py:964) — same as
    ``edge_vectors`` with periodic inputs, exposed under the reference name."""
    return edge_vectors(batch, positions)


def angle_triples(batch: GraphBatch, positions: Optional[Array] = None,
                  key: str = "node_coordinates", eps: float = 1e-12
                  ) -> Tuple[Array, Array, Array]:
    """Per-angle geometry for (i, j, k) triples with central node i
    (ACSF G4 convention; cf. EdgeAngle kgcnn/layers/geom.py:450).

    Returns ``(cos_theta (A,1), r_ij (A,1), r_ik (A,1))``.
    """
    assert batch.angles is not None, "batch has no angle triples"
    pos = positions if positions is not None else batch.nodes[key]
    i, j, k = batch.angles[:, 0], batch.angles[:, 1], batch.angles[:, 2]
    vij = pos[j] - pos[i]
    vik = pos[k] - pos[i]
    r2ij = jnp.sum(vij * vij, axis=-1, keepdims=True)
    r2ik = jnp.sum(vik * vik, axis=-1, keepdims=True)
    rij = jnp.sqrt(jnp.maximum(r2ij, eps))
    rik = jnp.sqrt(jnp.maximum(r2ik, eps))
    cos = jnp.sum(vij * vik, axis=-1, keepdims=True) / (rij * rik)
    cos = jnp.clip(cos, -1.0, 1.0)
    valid = (r2ij > eps) & (r2ik > eps)
    return jnp.where(valid, cos, 0.0), jnp.where(r2ij > eps, rij, 0.0), \
        jnp.where(r2ik > eps, rik, 0.0)
