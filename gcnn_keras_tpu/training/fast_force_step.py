"""Byte-lean energy+force training step.

The naive step differentiates ``loss(energy, force)`` with ``jax.grad``,
where ``force = -dE/dx`` itself comes from a reverse pass — so the force-loss
gradient is computed **reverse-over-reverse**: XLA must store the entire
first backward graph as residuals for the second, and on TPU the step is
HBM-bandwidth-bound on exactly that traffic (see PERF.md: 3.21 GB/step at
the 819 GB/s roofline).

This module reformulates the same gradient **reverse-over-forward**. For any
force loss ``L_f(f)`` with ``f(θ) = s·∂E/∂x``:

    ∂L_f/∂θ = (∂L_f/∂f)ᵀ · ∂f/∂θ
            = ∂/∂θ [ vᵀ f(θ) ]          with v = stopgrad(∂L_f/∂f)
            = s · ∂/∂θ [ jvp_x(E; v) ]

i.e. one cheap elementwise pass for ``v``, a forward-mode directional
derivative of the energy along ``v`` (a scalar), and a single reverse pass
over that *forward* computation. No approximation — ``v`` carries the entire
dependence of ``L_f`` on ``f``, so treating it as a constant is the chain
rule, not a linearization. The energy (and any auxiliary) loss rides the
same surrogate's primal.

Measured on TPU v5e (SchNet 128-unit/depth-4, 128-molecule batch): the
replaced reverse-over-reverse step is the framework's hottest path; the
reference has no analog (it pays ``tape.batch_jacobian`` per step,
``model/force.py:176``).
"""
from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..batch import GraphBatch
from .losses import force_loss, masked_graph_mae, masked_graph_mse

Array = jax.Array


def energy_force_value_and_grad(
        energy_model,
        energy_weight: float = 1.0,
        force_weight: float = 50.0,
        energy_loss_kind: str = "mae",
        force_loss_kind: str = "mae",
        energy_output_key: str = "output",
        coordinates_key: str = "node_coordinates",
        energy_target_key: str = "energy",
        force_target_key: str = "force",
        is_physical_force: bool = True,
        aux_loss_fn: Optional[Callable] = None,
        **apply_kwargs,
) -> Callable[[Dict, GraphBatch], Tuple[Tuple[Array, Dict], Dict]]:
    """Build ``vag(params, batch) -> ((loss, metrics), grads)``.

    Drop-in replacement for ``jax.value_and_grad`` over the standard
    energy+force loss (identical gradients to machine precision), with the
    force-loss gradient computed reverse-over-forward as derived above.

    ``aux_loss_fn(out_energy_per_graph, batch)`` may add extra terms that
    depend only on the energy-model outputs (they ride the surrogate primal).
    """
    sign = -1.0 if is_physical_force else 1.0
    e_loss_fn = masked_graph_mae if energy_loss_kind == "mae" else masked_graph_mse

    def vag(params, batch: GraphBatch):
        coords = batch.nodes[coordinates_key]
        gmask = batch.globals["graph_mask"]
        nmask = batch.node_mask
        f_true = batch.nodes[force_target_key]
        e_true = batch.globals[energy_target_key]

        def e_total(p, c):
            b = batch.replace_nodes(**{coordinates_key: c})
            out = energy_model.apply(p, b, **apply_kwargs)
            e = out[energy_output_key]
            gm = gmask.astype(e.dtype).reshape(gmask.shape + (1,) * (e.ndim - 1))
            e = e * gm
            return jnp.sum(e), e

        # pass 1: forces (the one unavoidable reverse pass w.r.t. coords)
        (_, e_graph), de_dr = jax.value_and_grad(
            e_total, argnums=1, has_aux=True)(params, coords)
        nm = nmask.reshape(nmask.shape + (1,) * (de_dr.ndim - nmask.ndim))
        force = sign * de_dr * nm.astype(de_dr.dtype)

        # v = dL_f/df, an elementwise reverse pass that never touches the model
        f_loss_val, v_f = jax.value_and_grad(
            lambda f: force_weight * force_loss(f, f_true, nmask,
                                                kind=force_loss_kind))(force)
        v = jax.lax.stop_gradient(sign * v_f * nm.astype(v_f.dtype))

        e_loss_val = e_loss_fn(e_graph, e_true, gmask)
        loss = energy_weight * e_loss_val + f_loss_val
        metrics = {"energy_loss": e_loss_val, "force_loss": f_loss_val}

        def surrogate(p):
            (_, e_g), (de_dv, _) = jax.jvp(
                lambda c: e_total(p, c), (coords,), (v,))
            s = energy_weight * e_loss_fn(e_g, e_true, gmask) + de_dv
            if aux_loss_fn is not None:
                s = s + aux_loss_fn(e_g, batch)
            return s

        grads = jax.grad(surrogate)(params)
        if aux_loss_fn is not None:
            metrics["aux_loss"] = aux_loss_fn(e_graph, batch)
            loss = loss + metrics["aux_loss"]
        return (loss, metrics), grads

    return vag


def make_force_train_step(energy_model, optimizer, donate: bool = True,
                          **vag_kwargs):
    """Jitted ``step(params, opt_state, batch) -> (params, opt_state, loss,
    metrics)`` using the reverse-over-forward gradient."""
    import optax

    vag = energy_force_value_and_grad(energy_model, **vag_kwargs)

    def step(params, opt_state, batch):
        (loss, metrics), grads = vag(params, batch)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, metrics

    donate_argnums = (0, 1) if donate else ()
    return jax.jit(step, donate_argnums=donate_argnums)
