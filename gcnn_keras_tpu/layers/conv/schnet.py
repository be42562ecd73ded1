"""SchNet continuous-filter convolution and interaction block.

Parity with ``kgcnn/layers/conv/schnet_conv.py:9,93`` (behavior, not code):
- CFconv: filter = Dense(act) -> Dense(linear) on the radial basis; gather
  sending-node features; multiply; segment-sum onto receivers.
- Interaction: x + Dense_lin3( Dense_act2( CFconv( Dense_nobias1(x) ) ) ).

TPU notes: the gather-multiply-segment-sum chain is the SpMM hot path; the
two filter Denses are (E, bins) @ (bins, U) matmuls that XLA fuses and maps
onto the MXU; a Pallas fused variant lives in ``ops/pallas``.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn

from ...batch import GraphBatch
from ..aggr import gather_mul_pool_edges, gather_nodes, pool_edges_to_nodes
from ..mlp import Dense

Array = jax.Array


def _is_ssp(activation) -> bool:
    """True for either spelling of the reference filter activation
    (ops/activ.py registers the config-parity alias)."""
    return activation in ("shifted_softplus", "kgcnn>shifted_softplus")


class SchNetCFconv(nn.Module):
    units: int
    activation: Any = "shifted_softplus"
    use_bias: bool = True
    cfconv_pool: str = "sum"
    dtype: Any = None
    # Pallas fused gather*filter->segment-sum: faster FORWARD (inference/MD),
    # slower in grad-of-grad training — see gather_mul_pool_edges
    fused_aggregate: bool = False
    # ACCURACY mode for the MD/inference path: the fully fused
    # basis->filter-MLP->multiply->segment-sum kernel
    # (ops/pallas/fused_cfconv.py) forces f32 Precision.HIGHEST matmuls in
    # VMEM — measured ~38x more accurate forces than XLA's default bf16
    # truncation at ~10% lower throughput (PERF.md "Fused cfconv kernel").
    # FIRST-order differentiable only (custom_vjp): energies + forces work,
    # grad-of-grad training raises — keep False for training.
    accurate_cfconv: bool = False
    # TRAINING fusion mode (ops/pallas/fused_interaction.py): the whole
    # positions->basis->filter-MLP->gather-mul->segment-sum chain in three
    # AD-closed Pallas kernels covering reverse-over-reverse (energy+force
    # training). Requires the reference cfconv config + gauss_args; falls
    # back to the unfused path when the batch is ineligible (periodic /
    # partitioned / non-window-local / non-TPU). Reverse-mode only.
    fused_chain: bool = False
    gauss_args: Any = None  # dict; required by fused_chain (basis config)

    @nn.compact
    def __call__(self, batch: GraphBatch, nodes: Array, edge_basis: Array) -> Array:
        d1 = Dense(self.units, activation=self.activation, use_bias=self.use_bias,
                   dtype=self.dtype, name="filter_1")
        d2 = Dense(self.units, activation="linear", use_bias=self.use_bias,
                   dtype=self.dtype, name="filter_2")
        if self.fused_chain:
            out = self._fused_chain(batch, nodes, d1, d2)
            if out is not None:
                return out
        if self.accurate_cfconv:
            if (not _is_ssp(self.activation) or not self.use_bias
                    or self.cfconv_pool != "sum"):
                raise ValueError(
                    "accurate_cfconv requires the reference cfconv config "
                    "(shifted_softplus filter, use_bias=True, sum pooling)")
            # create the identical parameter pytree WITHOUT materializing
            # the (E, U) filter — the kernel recomputes it in VMEM
            d2(d1(edge_basis[:1]))
            p1 = d1.variables["params"]["Dense_0"]
            p2 = d2.variables["params"]["Dense_0"]
            from ...ops.pallas.fused_cfconv import fused_cfconv_auto
            from ..aggr import gather_sender_nodes
            xj = gather_sender_nodes(batch, nodes)
            return fused_cfconv_auto(
                edge_basis, xj, batch.receivers, nodes.shape[0],
                p1["kernel"], p1["bias"], p2["kernel"], p2["bias"])
        f = d2(d1(edge_basis))
        return gather_mul_pool_edges(batch, nodes, f, mode=self.cfconv_pool,
                                     fused=self.fused_aggregate)

    def _fused_chain(self, batch: GraphBatch, nodes: Array, d1, d2):
        """Route through the AD-closed fused-chain kernels when eligible;
        return None to fall back to the unfused path."""
        from ...ops.pallas import fused_interaction as fi

        if (not _is_ssp(self.activation) or not self.use_bias
                or self.cfconv_pool != "sum" or self.dtype is not None):
            raise ValueError(
                "fused_chain requires the reference cfconv config "
                "(shifted_softplus filter, use_bias=True, sum pooling, "
                "f32)")
        if not self.gauss_args:
            raise ValueError(
                "fused_chain needs gauss_args (the model passes them "
                "only when make_distance and expand_distance are True)")
        ga = dict(self.gauss_args)
        st = fi.CFStatic(bins=int(ga.get("bins", 20)),
                         distance_max=float(ga.get("distance_max", 4.0)),
                         offset=float(ga.get("offset", 0.0)),
                         sigma=float(ga.get("sigma", 0.4)),
                         units=self.units)
        if (fi.fused_chain_ineligibility(batch, st.bins)
                or batch.senders.shape[0] < 8192 and not fi.FORCE_INTERPRET):
            return None
        # create the identical parameter pytree; the kernels recompute the
        # filter from positions in VMEM
        d2(d1(jnp.zeros((1, st.bins), jnp.float32)))
        p1 = d1.variables["params"]["Dense_0"]
        p2 = d2.variables["params"]["Dense_0"]
        return fi.cfconv_fused_chain(
            nodes, batch.nodes["node_coordinates"],
            p1["kernel"], p1["bias"], p2["kernel"], p2["bias"],
            batch.senders, batch.receivers, batch.edge_mask, st,
            batch.n_node, interpret=fi.FORCE_INTERPRET)


class SchNetCFconvDense(nn.Module):
    """Dense-block cfconv (see ``layers/dense_block.py``): same math as
    :class:`SchNetCFconv` on ``(G, M, F)`` padded blocks over a ``(G, M, M)``
    adjacency — the filter MLP runs as one big MXU matmul and the
    gather-mul-segsum chain collapses to a fusable masked reduce.

    Submodule names match :class:`SchNetCFconv` exactly so the two execution
    modes share one parameter pytree."""

    units: int
    activation: Any = "shifted_softplus"
    use_bias: bool = True
    cfconv_pool: str = "sum"
    dtype: Any = None

    @nn.compact
    def __call__(self, adj: Array, nodes_p: Array, basis_p: Array) -> Array:
        f = Dense(self.units, activation=self.activation, use_bias=self.use_bias,
                  dtype=self.dtype, name="filter_1")(basis_p)
        f = Dense(self.units, activation="linear", use_bias=self.use_bias,
                  dtype=self.dtype, name="filter_2")(f)
        m = f * nodes_p[:, None, :, :] * adj[..., None].astype(f.dtype)
        agg = jnp.sum(m, axis=2)  # over senders j -> (G, M, U)
        if self.cfconv_pool == "mean":
            deg = jnp.maximum(jnp.sum(adj, axis=2), 1.0)[..., None]
            agg = agg / deg.astype(agg.dtype)
        elif self.cfconv_pool != "sum":
            raise ValueError(f"dense-block cfconv_pool {self.cfconv_pool!r} "
                             "unsupported (sum|mean)")
        return agg


class SchNetInteractionDense(nn.Module):
    """Dense-block variant of :class:`SchNetInteraction` (same parameter
    pytree; operates on padded ``(G, M, F)`` node blocks)."""

    units: int = 128
    activation: Any = "shifted_softplus"
    use_bias: bool = True
    cfconv_pool: str = "sum"
    dtype: Any = None
    fused_aggregate: bool = False   # accepted for config parity; unused
    accurate_cfconv: bool = False   # accepted for config parity; unused
    fused_chain: bool = False       # accepted for config parity; unused
    gauss_args: Any = None          # accepted for config parity; unused

    @nn.compact
    def __call__(self, adj: Array, nodes_p: Array, basis_p: Array) -> Array:
        x = Dense(self.units, activation="linear", use_bias=False,
                  dtype=self.dtype, name="pre")(nodes_p)
        x = SchNetCFconvDense(self.units, activation=self.activation,
                              use_bias=self.use_bias,
                              cfconv_pool=self.cfconv_pool,
                              dtype=self.dtype, name="cfconv")(adj, x, basis_p)
        x = Dense(self.units, activation=self.activation, use_bias=self.use_bias,
                  dtype=self.dtype, name="post_1")(x)
        x = Dense(self.units, activation="linear", use_bias=self.use_bias,
                  dtype=self.dtype, name="post_2")(x)
        return nodes_p + x.astype(nodes_p.dtype)


class SchNetInteraction(nn.Module):
    units: int = 128
    activation: Any = "shifted_softplus"
    use_bias: bool = True
    cfconv_pool: str = "sum"
    dtype: Any = None
    fused_aggregate: bool = False
    accurate_cfconv: bool = False  # MD/inference accuracy mode (see CFconv)
    fused_chain: bool = False      # AD-closed fused training chain
    gauss_args: Any = None

    @nn.compact
    def __call__(self, batch: GraphBatch, nodes: Array, edge_basis: Array) -> Array:
        x = Dense(self.units, activation="linear", use_bias=False,
                  dtype=self.dtype, name="pre")(nodes)
        x = SchNetCFconv(self.units, activation=self.activation,
                         use_bias=self.use_bias, cfconv_pool=self.cfconv_pool,
                         dtype=self.dtype, fused_aggregate=self.fused_aggregate,
                         accurate_cfconv=self.accurate_cfconv,
                         fused_chain=self.fused_chain,
                         gauss_args=self.gauss_args,
                         name="cfconv")(batch, x, edge_basis)
        x = Dense(self.units, activation=self.activation, use_bias=self.use_bias,
                  dtype=self.dtype, name="post_1")(x)
        x = Dense(self.units, activation="linear", use_bias=self.use_bias,
                  dtype=self.dtype, name="post_2")(x)
        return nodes + x.astype(nodes.dtype)
