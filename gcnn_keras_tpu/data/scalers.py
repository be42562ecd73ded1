"""Label scalers.

Parity: ``kgcnn/data/transform/scaler/`` — StandardLabelScaler
(scaler.py:401), ExtensiveMolecularLabelScaler (mol.py:468; Ridge fit of
per-element energy offsets on composition counts, mol.py:38-75) and
EnergyForceExtensiveLabelScaler (force.py:11; joint energy/force scaling
with dataset-level transform + JSON save/load).
"""
from __future__ import annotations

import json
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

_MAX_Z = 96


class StandardLabelScaler:
    """y <- (y - mean) / std (``scaler.py:401``)."""

    def __init__(self, with_mean: bool = True, with_std: bool = True, **kwargs):
        self.with_mean = with_mean
        self.with_std = with_std
        self.mean_: Optional[np.ndarray] = None
        self.scale_: Optional[np.ndarray] = None

    def fit(self, y: np.ndarray, **kwargs):
        y = np.asarray(y, dtype=np.float64)
        self.mean_ = y.mean(axis=0) if self.with_mean else np.zeros(y.shape[1:])
        std = y.std(axis=0) if self.with_std else np.ones(y.shape[1:])
        self.scale_ = np.where(std > 0, std, 1.0)
        return self

    def transform(self, y: np.ndarray) -> np.ndarray:
        return (np.asarray(y) - self.mean_) / self.scale_

    def inverse_transform(self, y: np.ndarray) -> np.ndarray:
        return np.asarray(y) * self.scale_ + self.mean_

    def fit_transform(self, y, **kwargs):
        return self.fit(y, **kwargs).transform(y)

    def get_scaling(self) -> np.ndarray:
        return self.scale_

    def get_config(self) -> dict:
        return {"with_mean": self.with_mean, "with_std": self.with_std,
                "mean_": None if self.mean_ is None else np.asarray(self.mean_).tolist(),
                "scale_": None if self.scale_ is None else np.asarray(self.scale_).tolist()}

    def set_config(self, cfg: dict):
        self.with_mean = cfg.get("with_mean", True)
        self.with_std = cfg.get("with_std", True)
        self.mean_ = None if cfg.get("mean_") is None else np.array(cfg["mean_"])
        self.scale_ = None if cfg.get("scale_") is None else np.array(cfg["scale_"])
        return self


class StandardScaler(StandardLabelScaler):
    """Feature-wise standardization for graph properties
    (``transform/scaler/scaler.py:211``) — same math as the label scaler,
    applied to per-node or per-graph feature matrices."""

    def fit_dataset(self, dataset, key: str = "node_attributes"):
        stacked = np.concatenate([np.asarray(g[key]) for g in dataset], axis=0)
        return self.fit(stacked)

    def transform_dataset(self, dataset, key: str = "node_attributes"):
        for g in dataset:
            g[key] = self.transform(np.asarray(g[key])).astype(np.float32)
        return dataset


class QMGraphLabelScaler:
    """Per-target scaler list for multi-target QM labels
    (``transform/scaler/mol.py:598``): each column gets its own scaler
    (standard or extensive)."""

    def __init__(self, scaler: List):
        self.scalers = []
        for s in scaler:
            if isinstance(s, dict):
                cls = {"StandardLabelScaler": StandardLabelScaler,
                       "ExtensiveMolecularLabelScaler": ExtensiveMolecularLabelScaler}[
                    s["class_name"]]
                self.scalers.append(cls(**s.get("config", {})))
            else:
                self.scalers.append(s)

    def fit_transform(self, y: np.ndarray, atomic_number=None) -> np.ndarray:
        y = np.asarray(y, dtype=np.float64)
        out = np.zeros_like(y)
        for i, s in enumerate(self.scalers):
            col = y[:, i]
            if isinstance(s, ExtensiveMolecularLabelScaler):
                out[:, i] = s.fit(col, atomic_number).transform(col, atomic_number)
            else:
                out[:, i] = s.fit(col[:, None]).transform(col[:, None])[:, 0]
        return out

    def inverse_transform(self, y: np.ndarray, atomic_number=None) -> np.ndarray:
        y = np.asarray(y, dtype=np.float64)
        out = np.zeros_like(y)
        for i, s in enumerate(self.scalers):
            col = y[:, i]
            if isinstance(s, ExtensiveMolecularLabelScaler):
                out[:, i] = s.inverse_transform(col, atomic_number)
            else:
                out[:, i] = s.inverse_transform(col[:, None])[:, 0]
        return out

    def get_scaling(self) -> np.ndarray:
        return np.array([np.asarray(s.get_scaling()).reshape(-1)[0]
                         for s in self.scalers])


def composition_matrix(atomic_numbers: Sequence[np.ndarray],
                       max_z: int = _MAX_Z) -> np.ndarray:
    """Count matrix X[i, z] = #atoms of element z in molecule i."""
    x = np.zeros((len(atomic_numbers), max_z), dtype=np.float64)
    for i, z in enumerate(atomic_numbers):
        zi, cnt = np.unique(np.asarray(z, dtype=np.int64), return_counts=True)
        x[i, zi] = cnt
    return x


class ExtensiveMolecularLabelScaler:
    """Remove per-element (composition-linear) offsets via Ridge regression,
    optionally scale by std (``transform/scaler/mol.py:354,468``)."""

    def __init__(self, alpha: float = 1e-9, fit_atomic_number: bool = True,
                 standardize_scale: bool = True, **kwargs):
        self.alpha = alpha
        self.standardize_scale = standardize_scale
        self.ridge_coef_: Optional[np.ndarray] = None
        self.scale_: Optional[np.ndarray] = None

    def fit(self, y: np.ndarray, atomic_number: Sequence[np.ndarray], **kwargs):
        y = np.asarray(y, dtype=np.float64)
        squeeze = y.ndim == 1
        y2 = y[:, None] if squeeze else y
        x = composition_matrix(atomic_number)
        # closed-form ridge: (X^T X + a I)^-1 X^T y  (mol.py:38-75 _fit)
        xtx = x.T @ x + self.alpha * np.eye(x.shape[1])
        self.ridge_coef_ = np.linalg.solve(xtx, x.T @ y2)
        resid = y2 - x @ self.ridge_coef_
        std = resid.std(axis=0) if self.standardize_scale else np.ones(y2.shape[1])
        self.scale_ = np.where(std > 0, std, 1.0)
        self._squeeze = squeeze
        return self

    def _offset(self, atomic_number) -> np.ndarray:
        x = composition_matrix(atomic_number)
        return x @ self.ridge_coef_

    def transform(self, y: np.ndarray, atomic_number) -> np.ndarray:
        y = np.asarray(y, dtype=np.float64)
        y2 = y[:, None] if y.ndim == 1 else y
        out = (y2 - self._offset(atomic_number)) / self.scale_
        return out[:, 0] if y.ndim == 1 else out

    def inverse_transform(self, y: np.ndarray, atomic_number) -> np.ndarray:
        y = np.asarray(y, dtype=np.float64)
        y2 = y[:, None] if y.ndim == 1 else y
        out = y2 * self.scale_ + self._offset(atomic_number)
        return out[:, 0] if y.ndim == 1 else out

    def fit_transform(self, y, atomic_number, **kwargs):
        return self.fit(y, atomic_number).transform(y, atomic_number)

    def get_scaling(self) -> np.ndarray:
        return self.scale_

    def get_config(self) -> dict:
        return {"alpha": self.alpha, "standardize_scale": self.standardize_scale,
                "ridge_coef_": None if self.ridge_coef_ is None else self.ridge_coef_.tolist(),
                "scale_": None if self.scale_ is None else np.asarray(self.scale_).tolist()}

    def set_config(self, cfg: dict):
        self.alpha = cfg.get("alpha", 1e-9)
        self.standardize_scale = cfg.get("standardize_scale", True)
        self.ridge_coef_ = None if cfg.get("ridge_coef_") is None else np.array(cfg["ridge_coef_"])
        self.scale_ = None if cfg.get("scale_") is None else np.array(cfg["scale_"])
        return self


class EnergyForceExtensiveLabelScaler(ExtensiveMolecularLabelScaler):
    """Joint energy/force scaling (``transform/scaler/force.py:11``):
    energies get the extensive offset removed and scaled; forces are scaled
    by the same factor (offsets are composition-constant, so dE/dr is
    unaffected by them)."""

    def __init__(self, standardize_scale: bool = True,
                 energy: str = "energy", force: str = "force",
                 atomic_number: str = "node_number", **kwargs):
        super().__init__(standardize_scale=standardize_scale, **kwargs)
        self.energy_key = energy
        self.force_key = force
        self.atomic_number_key = atomic_number

    def transform_forces(self, forces: Sequence[np.ndarray]) -> List[np.ndarray]:
        return [np.asarray(f) / self.scale_[0] for f in forces]

    def inverse_transform_forces(self, forces: Sequence[np.ndarray]) -> List[np.ndarray]:
        return [np.asarray(f) * self.scale_[0] for f in forces]

    # dataset-level API (force.py fit_dataset/transform_dataset)
    def fit_dataset(self, dataset):
        y = np.array([np.asarray(g[self.energy_key]).reshape(-1)[0] for g in dataset])
        z = [np.asarray(g[self.atomic_number_key]) for g in dataset]
        return self.fit(y, z)

    def transform_dataset(self, dataset, copy: bool = False):
        y = np.array([np.asarray(g[self.energy_key]).reshape(-1)[0] for g in dataset])
        z = [np.asarray(g[self.atomic_number_key]) for g in dataset]
        y_t = self.transform(y, z)
        for g, yt in zip(dataset, y_t):
            g[self.energy_key] = np.array([yt], dtype=np.float32)
            if self.force_key in g:
                g[self.force_key] = (np.asarray(g[self.force_key]) /
                                     self.scale_[0]).astype(np.float32)
        return dataset

    def inverse_transform_dataset(self, dataset):
        y = np.array([np.asarray(g[self.energy_key]).reshape(-1)[0] for g in dataset])
        z = [np.asarray(g[self.atomic_number_key]) for g in dataset]
        y_t = self.inverse_transform(y, z)
        for g, yt in zip(dataset, y_t):
            g[self.energy_key] = np.array([yt], dtype=np.float32)
            if self.force_key in g:
                g[self.force_key] = (np.asarray(g[self.force_key]) *
                                     self.scale_[0]).astype(np.float32)
        return dataset

    def save(self, file_path: str):
        with open(file_path, "w") as f:
            json.dump(self.get_config(), f)

    def load(self, file_path: str):
        with open(file_path) as f:
            self.set_config(json.load(f))
        return self
