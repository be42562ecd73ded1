"""Native (C++) runtime components, loaded via ctypes with graceful
fallback.

The compute path of this framework is jax/XLA/Pallas on TPU; the native
layer covers the HOST-side hot loops that feed the chip — currently the
cell-list neighbor search (``native/neighborlist.cpp``), which replaces the
reference's O(N^2) numpy distance matrix (``kgcnn/graph/preprocessor.py:255``)
for MD inference (list rebuilt every step) and dataset preprocessing.

Loading order:
1. ``GCNN_TPU_NATIVE_LIB`` env var (explicit path),
2. a prebuilt ``_libneighborlist.so`` next to this module,
3. compile-on-demand from ``native/neighborlist.cpp`` with g++ into a
   per-user cache (once; ~1 s),
4. otherwise ``available() == False`` and callers use the numpy path.
"""
from __future__ import annotations

import ctypes
import hashlib
import logging
import os
import subprocess
import tempfile
from typing import Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_SRC = os.path.join(os.path.dirname(__file__), "..", "..", "native",
                    "neighborlist.cpp")
_CACHE_DIR = os.path.join(tempfile.gettempdir(),
                          f"gcnn_tpu_native_{os.getuid()}")


def _src_tag() -> str:
    """Cache key: hash of the C++ source, so edits force a rebuild."""
    try:
        with open(os.path.abspath(_SRC), "rb") as f:
            return hashlib.sha256(f.read()).hexdigest()[:12]
    except OSError:
        return "prebuilt"


def _candidate_paths():
    env = os.environ.get("GCNN_TPU_NATIVE_LIB")
    if env:
        yield env
    yield os.path.join(os.path.dirname(__file__), "_libneighborlist.so")
    yield os.path.join(_CACHE_DIR, f"_libneighborlist_{_src_tag()}.so")


def _compile() -> Optional[str]:
    src = os.path.abspath(_SRC)
    if not os.path.exists(src):
        return None
    os.makedirs(_CACHE_DIR, exist_ok=True)
    out = os.path.join(_CACHE_DIR, f"_libneighborlist_{_src_tag()}.so")
    for flags in (["-O3", "-fopenmp"], ["-O3"]):  # OpenMP optional
        cmd = ["g++", *flags, "-shared", "-fPIC", src, "-o", out]
        try:
            res = subprocess.run(cmd, capture_output=True, timeout=120)
            if res.returncode == 0:
                return out
        except (OSError, subprocess.TimeoutExpired):
            return None
    logger.warning("native build failed: %s", res.stderr.decode()[:500])
    return None


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    def _try(path):
        try:
            lib = ctypes.CDLL(path)
            # stale prebuilt libraries missing newer symbols are rejected
            lib.neighbor_list_cell
            lib.neighbor_list_periodic
            return lib
        except (OSError, AttributeError):
            return None

    for path in _candidate_paths():
        if path and os.path.exists(path):
            _LIB = _try(path)
            if _LIB is not None:
                break
    if _LIB is None:
        built = _compile()
        if built:
            _LIB = _try(built)
    if _LIB is not None:
        _LIB.neighbor_list_cell.restype = ctypes.c_longlong
        _LIB.neighbor_list_cell.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_longlong,
            ctypes.c_double, ctypes.c_longlong,
            ctypes.POINTER(ctypes.c_longlong),
            ctypes.POINTER(ctypes.c_double),
        ]
        _LIB.neighbor_list_periodic.restype = ctypes.c_longlong
        _LIB.neighbor_list_periodic.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_longlong,
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_longlong), ctypes.c_longlong,
            ctypes.c_double, ctypes.c_longlong,
            ctypes.c_longlong, ctypes.c_longlong,
            ctypes.POINTER(ctypes.c_longlong),
            ctypes.POINTER(ctypes.c_longlong),
            ctypes.POINTER(ctypes.c_double),
        ]
        logger.info("native neighbor list loaded (openmp=%d)",
                    _LIB.neighbor_list_has_openmp())
    return _LIB


def available() -> bool:
    return _load() is not None


def neighbor_list(xyz: np.ndarray, cutoff: float,
                  max_neighbors: int) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Cell-list neighbor search: returns ``(pairs (M,2) int64 [recv, send],
    dist (M,) float64)`` sorted by (recv, send), or None if the native
    library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    xyz = np.ascontiguousarray(xyz, dtype=np.float64)
    n = xyz.shape[0]
    k = int(min(max_neighbors, max(n - 1, 1)))
    pairs = np.empty((n * k, 2), dtype=np.int64)
    dist = np.empty(n * k, dtype=np.float64)
    m = lib.neighbor_list_cell(
        xyz.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.c_longlong(n), ctypes.c_double(float(cutoff)),
        ctypes.c_longlong(k),
        pairs.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)),
        dist.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    if m < 0:
        return None
    return pairs[:m], dist[:m]


def neighbor_list_periodic(
        xyz: np.ndarray, lattice: np.ndarray, cutoff: float,
        max_neighbors: Optional[int] = None,
) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """Periodic cell-list neighbor search over lattice images.

    Image range per lattice direction is cutoff / plane-spacing — identical
    to the numpy path (``graph/preprocess.py`` set_range_periodic) and the
    reference's ``range_neighbour_lattice`` (``kgcnn/graph/geom.py:172``).
    Returns ``(pairs (M,2) int64 [recv, send], images (M,3) int64 sender
    image, dist (M,) float64)`` sorted by (recv, send, image), or None if
    the native library is unavailable.
    """
    lib = _load()
    if lib is None:
        return None
    xyz = np.ascontiguousarray(xyz, dtype=np.float64)
    lat = np.asarray(lattice, dtype=np.float64)
    n = xyz.shape[0]
    recip = np.linalg.inv(lat).T
    spacing = 1.0 / np.maximum(np.linalg.norm(recip, axis=1), 1e-12)
    n_img = np.maximum(np.ceil(cutoff / spacing).astype(int), 1)
    rng = [np.arange(-k, k + 1) for k in n_img]
    images = np.ascontiguousarray(
        np.stack(np.meshgrid(*rng, indexing="ij"), axis=-1).reshape(-1, 3),
        dtype=np.int64)
    shifts = np.ascontiguousarray(images @ lat, dtype=np.float64)
    central = int(np.nonzero(np.all(images == 0, axis=1))[0][0])

    k = int(max_neighbors) if max_neighbors is not None else 0
    # initial capacity: per-receiver cap, or a density-based estimate that
    # the retry loop below corrects if it undershoots
    cap = n * k if k > 0 else max(n * 64, 1024)
    for _ in range(2):
        pairs = np.empty((cap, 2), dtype=np.int64)
        img_out = np.empty((cap, 3), dtype=np.int64)
        dist = np.empty(cap, dtype=np.float64)
        m = lib.neighbor_list_periodic(
            xyz.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            ctypes.c_longlong(n),
            shifts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            images.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)),
            ctypes.c_longlong(images.shape[0]),
            ctypes.c_double(float(cutoff)), ctypes.c_longlong(k),
            ctypes.c_longlong(central), ctypes.c_longlong(cap),
            pairs.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)),
            img_out.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)),
            dist.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
        if m >= 0:
            return pairs[:m], img_out[:m], dist[:m]
        cap = -m  # exact required size reported by the library
    return None
