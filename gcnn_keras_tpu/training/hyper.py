"""Hyperparameter configuration (parity: ``kgcnn/hyper/hyper.py:15``
HyperParameter): load a py/json/yaml config with ``model``/``data``/
``training`` sections, verify, and materialize optimizer / schedule / loss
objects for the jitted trainer.
"""
from __future__ import annotations

import importlib
import json
import os
from typing import Any, Callable, Dict, Optional

import optax

from .schedules import get_schedule


class HyperParameter:
    def __init__(self, hyper_info: Any, model_name: Optional[str] = None,
                 model_module: Optional[str] = None,
                 model_class: str = "make_model",
                 dataset_name: Optional[str] = None, **kwargs):
        if isinstance(hyper_info, str):
            self._hyper_all = self._load(hyper_info)
        elif isinstance(hyper_info, dict):
            self._hyper_all = dict(hyper_info)
        else:
            raise TypeError("hyper_info must be a path or dict")
        self.model_name = model_name
        self.model_module = model_module
        self.model_class = model_class
        self.dataset_name = dataset_name
        self._hyper = self._select(self._hyper_all)
        self.verify()

    @staticmethod
    def _load(path: str) -> dict:
        if path.endswith(".json"):
            with open(path) as f:
                return json.load(f)
        if path.endswith((".yaml", ".yml")):
            import yaml
            with open(path) as f:
                return yaml.safe_load(f)
        if path.endswith(".py"):
            spec = importlib.util.spec_from_file_location("hyper_config", path)
            mod = importlib.util.module_from_spec(spec)
            spec.loader.exec_module(mod)
            return mod.hyper
        raise ValueError(f"unknown config format: {path}")

    def _select(self, h: dict) -> dict:
        # configs may be keyed by model name (training/hyper/hyper_*.py style)
        if self.model_name and self.model_name in h:
            return h[self.model_name]
        if "model" in h:
            return h
        if len(h) == 1:
            return next(iter(h.values()))
        return h

    def verify(self):
        """Check section structure + model name/module consistency
        (hyper/hyper.py:77)."""
        h = self._hyper
        if "model" in h:
            m = h["model"]
            cfg_name = m.get("class_name")
            if self.model_class and cfg_name and self.model_class not in (
                    cfg_name, "make_model") and cfg_name != "make_model":
                pass  # builder alias differences are allowed
            if self.model_name and m.get("config", {}).get("name") not in (
                    None, self.model_name):
                raise ValueError(
                    f"config model name {m['config'].get('name')} != {self.model_name}")

    def __getitem__(self, key):
        return self._hyper[key]

    def __contains__(self, key):
        return key in self._hyper

    # --- materialization ---------------------------------------------------
    def make_model(self):
        from ..models.registry import get_model_class
        m = self._hyper["model"]
        builder = get_model_class(m.get("module_name", self.model_module or
                                        self.model_name),
                                  m.get("class_name", self.model_class))
        return builder(**m.get("config", {}))

    def make_optimizer(self, steps_per_epoch: int = 1) -> optax.GradientTransformation:
        compile_cfg = self._hyper.get("training", {}).get("compile", {})
        opt_cfg = compile_cfg.get("optimizer", {"class_name": "Adam",
                                                "config": {"learning_rate": 1e-3}})
        name = opt_cfg.get("class_name", "Adam").lower()
        cfg = dict(opt_cfg.get("config", {}))
        lr = cfg.pop("learning_rate", 1e-3)
        if isinstance(lr, dict):  # serialized schedule
            lr = get_schedule(lr["class_name"], **lr.get("config", {}))
        table = {
            "adam": optax.adam,
            "adamw": optax.adamw,
            "nadam": optax.nadam,
            "sgd": optax.sgd,
            "rmsprop": optax.rmsprop,
            "adan": _adan,
        }
        kwargs = {k: v for k, v in cfg.items()
                  if k in ("b1", "b2", "b3", "weight_decay", "eps", "momentum")}
        return table[name](lr, **kwargs)

    def results_file_path(self) -> str:
        base = os.path.join("results", self.dataset_name or "dataset",
                            f"{self.model_name or 'model'}")
        os.makedirs(base, exist_ok=True)
        return base

    def save(self, path: str):
        with open(path, "w") as f:
            json.dump(self._hyper_all, f, indent=2, default=str)


def _adan(learning_rate, b1: float = 0.98, b2: float = 0.92, b3: float = 0.99,
          eps: float = 1e-8, weight_decay: float = 0.0):
    """Adan optimizer (parity: ``kgcnn/training/optimizer.py:7``), built
    from optax primitives: adaptive Nesterov momentum over gradient
    differences (Xie et al. 2022)."""
    import jax
    import jax.numpy as jnp
    from optax import GradientTransformation

    def init_fn(params):
        zeros = jax.tree.map(jnp.zeros_like, params)
        return {"m": zeros, "v": jax.tree.map(jnp.zeros_like, params),
                "n": jax.tree.map(jnp.zeros_like, params),
                "prev_g": jax.tree.map(jnp.zeros_like, params),
                "count": jnp.zeros((), jnp.int32)}

    def update_fn(grads, state, params=None):
        count = state["count"] + 1
        is_first = (count == 1).astype(jnp.float32)

        def upd(g, pg, m, v, n):
            diff = (1.0 - is_first) * (g - pg)
            m_new = b1 * m + (1 - b1) * g
            v_new = b2 * v + (1 - b2) * diff
            gd = g + b2 * diff
            n_new = b3 * n + (1 - b3) * gd * gd
            return m_new, v_new, n_new

        flat_g, treedef = jax.tree.flatten(grads)
        flat_pg = treedef.flatten_up_to(state["prev_g"])
        flat_m = treedef.flatten_up_to(state["m"])
        flat_v = treedef.flatten_up_to(state["v"])
        flat_n = treedef.flatten_up_to(state["n"])
        new_m, new_v, new_n, updates = [], [], [], []
        lr = learning_rate(count) if callable(learning_rate) else learning_rate
        bc1 = 1 - b1 ** count
        bc2 = 1 - b2 ** count
        bc3 = 1 - b3 ** count
        for g, pg, m, v, n, p in zip(flat_g, flat_pg, flat_m, flat_v, flat_n,
                                     treedef.flatten_up_to(params)):
            m2, v2, n2 = upd(g, pg, m, v, n)
            denom = jnp.sqrt(n2 / bc3) + eps
            step = (m2 / bc1 + b2 * v2 / bc2) / denom
            u = -lr * step
            if weight_decay:
                u = u - lr * weight_decay * p
            new_m.append(m2); new_v.append(v2); new_n.append(n2); updates.append(u)
        new_state = {"m": treedef.unflatten(new_m),
                     "v": treedef.unflatten(new_v),
                     "n": treedef.unflatten(new_n),
                     "prev_g": grads, "count": count}
        return treedef.unflatten(updates), new_state

    return GradientTransformation(init_fn, update_fn)


Adan = _adan
