"""GNNExplainer (parity: ``kgcnn/literature/GNNExplain.py``, 614 LoC):
post-hoc explanation by optimizing soft edge / node-feature masks that
preserve the model's prediction while penalizing mask size and entropy.

TPU-native: masks are leaves of an optax optimization, the masked forward is
jit-compiled once and scanned over optimization steps.
"""
from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..batch import GraphBatch
from .base import ImportanceExplanationMethod

Array = jax.Array


class GNNExplainer(ImportanceExplanationMethod):
    def __init__(self, learning_rate: float = 0.01, epochs: int = 100,
                 edge_mask_loss: float = 0.005, edge_mask_norm: float = 1.0,
                 feature_mask_loss: float = 0.005,
                 node_feature_key: str = "node_attributes",
                 output_key: str = "output"):
        self.learning_rate = learning_rate
        self.epochs = epochs
        self.edge_mask_loss = edge_mask_loss
        self.feature_mask_loss = feature_mask_loss
        self.node_feature_key = node_feature_key
        self.output_key = output_key

    def __call__(self, model_apply: Callable, variables, batch: GraphBatch,
                 **kwargs) -> Tuple[Array, Array]:
        """Returns (node_importances (N,), edge_importances (E,))."""
        key = self.node_feature_key if self.node_feature_key in batch.nodes \
            else ("node_number" if "node_number" in batch.nodes else None)
        base_out = model_apply(variables, batch)[self.output_key]

        feats = batch.nodes[key]
        feat_dim = feats.shape[-1] if feats.ndim > 1 else 1

        masks = {
            "edge": jnp.zeros((batch.n_edge,)),
            "feat": jnp.zeros((batch.n_node, feat_dim)
                              if feats.ndim > 1 else (batch.n_node,)),
        }

        def masked_forward(masks):
            em = jax.nn.sigmoid(masks["edge"])
            fm = jax.nn.sigmoid(masks["feat"])
            new_nodes = dict(batch.nodes)
            if jnp.issubdtype(feats.dtype, jnp.floating):
                new_nodes[key] = feats * fm
            b = batch.replace(
                nodes=new_nodes,
                edge_mask=batch.edge_mask,  # structural mask unchanged
                edges={k: (v * em.reshape(em.shape + (1,) * (v.ndim - 1)).astype(v.dtype)
                           if jnp.issubdtype(v.dtype, jnp.floating) else v)
                       for k, v in batch.edges.items()})
            # edge mask also gates messages via edge weights when present
            return model_apply(variables, b)[self.output_key], (em, fm)

        def loss_fn(masks):
            out, (em, fm) = masked_forward(masks)
            pred_loss = jnp.sum((out - base_out) ** 2)
            em_v = em * batch.edge_mask.astype(em.dtype)
            size_loss = self.edge_mask_loss * jnp.sum(em_v)
            ent = -(em_v * jnp.log(em_v + 1e-9)
                    + (1 - em_v) * jnp.log(1 - em_v + 1e-9))
            ent_loss = 0.1 * jnp.mean(ent)
            feat_loss = self.feature_mask_loss * jnp.mean(jax.nn.sigmoid(masks["feat"]))
            return pred_loss + size_loss + ent_loss + feat_loss

        opt = optax.adam(self.learning_rate)
        opt_state = opt.init(masks)

        @jax.jit
        def step(carry, _):
            masks, opt_state = carry
            loss, grads = jax.value_and_grad(loss_fn)(masks)
            updates, opt_state = opt.update(grads, opt_state)
            masks = optax.apply_updates(masks, updates)
            return (masks, opt_state), loss

        (masks, _), losses = jax.lax.scan(step, (masks, opt_state),
                                          None, length=self.epochs)
        edge_imp = jax.nn.sigmoid(masks["edge"]) * batch.edge_mask
        feat_imp = jax.nn.sigmoid(masks["feat"])
        node_imp = feat_imp.mean(axis=-1) if feat_imp.ndim > 1 else feat_imp
        node_imp = node_imp * batch.node_mask
        return node_imp, edge_imp
