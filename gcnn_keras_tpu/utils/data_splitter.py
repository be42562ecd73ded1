"""Train/val/test split generator (parity: ``kgcnn/utils/data_splitter.py:7``
idx_generator) + k-fold with the fork's swapped train/val scheme
(force_hdnnp4th.py:366: each ensemble member sees a distinct validation
third)."""
from __future__ import annotations

from typing import Iterator, Tuple

import numpy as np


def idx_generator(n: int, val_ratio: float = 0.1, test_ratio: float = 0.1,
                  seed: int = 42) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    rs = np.random.RandomState(seed)
    idx = rs.permutation(n)
    n_val = int(n * val_ratio)
    n_test = int(n * test_ratio)
    return idx[n_val + n_test:], idx[:n_val], idx[n_val:n_val + n_test]


def kfold_indices(n: int, k: int = 5, seed: int = 42
                  ) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
    rs = np.random.RandomState(seed)
    idx = rs.permutation(n)
    folds = np.array_split(idx, k)
    for i in range(k):
        test = folds[i]
        train = np.concatenate([folds[j] for j in range(k) if j != i])
        yield train, test


def kfold_swapped_val(n: int, k: int = 3, seed: int = 42
                      ) -> Iterator[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """Ensemble scheme of the fork: fold i trains on all-but-two folds,
    validates on fold i+1, tests on fold i — every member sees a distinct
    validation slice (force_hdnnp4th.py:366)."""
    rs = np.random.RandomState(seed)
    idx = rs.permutation(n)
    folds = np.array_split(idx, k)
    for i in range(k):
        # k < 3: validation fold coincides with the test fold (otherwise the
        # train set would be empty)
        vi = (i + 1) % k if k >= 3 else i
        train = np.concatenate([folds[j] for j in range(k) if j not in (i, vi)])
        yield train, folds[vi], folds[i]
