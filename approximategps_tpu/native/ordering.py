"""ctypes bindings for the C++ Vecchia preprocessing (build-on-first-use)
with pure-numpy fallbacks.

The shared library is compiled once with g++ into a per-user cache dir; if
no compiler is available the numpy implementations (same algorithms, same
outputs) are used transparently.  Everything here is host-side, eager, and
deliberately outside jit — the outputs are plain gather indices consumed by
the device code."""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile
import threading

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)), "vecchia_order.cpp")
_LOCK = threading.Lock()
_LIB = None
_TRIED = False


def _cache_dir() -> str:
    base = os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache"))
    d = os.path.join(base, "approximategps_tpu")
    os.makedirs(d, exist_ok=True)
    return d


def _build() -> str | None:
    with open(_SRC, "rb") as f:
        tag = hashlib.sha256(f.read()).hexdigest()[:16]
    so_path = os.path.join(_cache_dir(), f"vecchia_order_{tag}.so")
    if os.path.exists(so_path):
        return so_path
    try:
        with tempfile.TemporaryDirectory() as td:
            tmp = os.path.join(td, "vecchia_order.so")
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", tmp],
                check=True,
                capture_output=True,
                timeout=120,
            )
            os.replace(tmp, so_path)
        return so_path
    except Exception:
        return None


def _load():
    global _LIB, _TRIED
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        so = _build()
        if so is None:
            return None
        lib = ctypes.CDLL(so)
        c_d = ctypes.POINTER(ctypes.c_double)
        c_i = ctypes.POINTER(ctypes.c_int64)
        lib.agp_maximin_order.argtypes = [c_d, ctypes.c_int64, ctypes.c_int64, c_i]
        lib.agp_maximin_order.restype = None
        lib.agp_nearest_predecessors.argtypes = [
            c_d, ctypes.c_int64, ctypes.c_int64, c_i, ctypes.c_int64, c_i,
        ]
        lib.agp_nearest_predecessors.restype = None
        lib.agp_scaled_predecessors.argtypes = [
            c_d, ctypes.c_int64, ctypes.c_int64, c_i,
            ctypes.c_double, ctypes.c_int64, c_i,
        ]
        lib.agp_scaled_predecessors.restype = None
        _LIB = lib
        return _LIB


def native_available() -> bool:
    return _load() is not None


def _as_f64_2d(X) -> np.ndarray:
    X = np.ascontiguousarray(np.asarray(X, dtype=np.float64))
    if X.ndim == 1:
        X = X[:, None]
    return X


def maximin_ordering(X) -> np.ndarray:
    """Greedy farthest-point (maximin) ordering (Guinness 2018): start near
    the centroid, then repeatedly add the point farthest from the ordered
    set.  Returns an (N,) int64 permutation.  Host-side/eager only."""
    X = _as_f64_2d(X)
    N, D = X.shape
    order = np.empty(N, dtype=np.int64)
    lib = _load()
    if lib is not None:
        lib.agp_maximin_order(
            X.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            N, D,
            order.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        )
        return order
    # numpy fallback: identical algorithm
    centroid = X.mean(axis=0)
    first = int(np.argmin(((X - centroid) ** 2).sum(-1)))
    mind = ((X - X[first]) ** 2).sum(-1)
    taken = np.zeros(N, dtype=bool)
    order[0] = first
    taken[first] = True
    mind[first] = -np.inf
    for step in range(1, N):
        pick = int(np.argmax(mind))
        order[step] = pick
        taken[pick] = True
        d = ((X - X[pick]) ** 2).sum(-1)
        np.minimum(mind, d, out=mind)
        mind[pick] = -np.inf
    return order


def nearest_predecessor_neighbors(X, order, k: int) -> np.ndarray:
    """For each ordering position i, the k nearest points among positions
    0..i−1 (exact).  Returns (N, k) int64 of ORDERING POSITIONS, ascending,
    padded with −1 where i < k.  Host-side/eager only."""
    X = _as_f64_2d(X)
    order = np.ascontiguousarray(np.asarray(order, dtype=np.int64))
    N, D = X.shape
    nbr = np.empty((N, int(k)), dtype=np.int64)
    lib = _load()
    if lib is not None:
        lib.agp_nearest_predecessors(
            X.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            N, D,
            order.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            int(k),
            nbr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        )
        return nbr
    # numpy fallback
    Xo = X[order]
    for i in range(N):
        m = min(k, i)
        if m == 0:
            nbr[i, :] = -1
            continue
        d = ((Xo[:i] - Xo[i]) ** 2).sum(-1)
        got = np.sort(np.argpartition(d, m - 1)[:m])
        nbr[i, :m] = got
        nbr[i, m:] = -1
    return nbr


def scaled_ball_predecessors(X, order, rho: float, k: int) -> np.ndarray:
    """KL-minimized sparsity pattern (Schäfer et al., arXiv 2004.14455)
    in the fixed-k TPU layout: for each ordering position i, the predecessors
    within distance ``rho * ell_i`` of point i, where ``ell_i`` is point i's
    distance to the already-ordered set (the maximin distance when ``order``
    is the maximin ordering).  Sets larger than k keep the k nearest; smaller
    sets pad with −1.  Returns (N, k) int64 ORDERING POSITIONS, ascending.
    Host-side/eager only."""
    X = _as_f64_2d(X)
    order = np.ascontiguousarray(np.asarray(order, dtype=np.int64))
    N, D = X.shape
    nbr = np.empty((N, int(k)), dtype=np.int64)
    lib = _load()
    if lib is not None:
        lib.agp_scaled_predecessors(
            X.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            N, D,
            order.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            float(rho), int(k),
            nbr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        )
        return nbr
    # numpy fallback: identical selection rule
    Xo = X[order]
    rho2 = float(rho) ** 2
    for i in range(N):
        if i == 0:
            nbr[i, :] = -1
            continue
        d = ((Xo[:i] - Xo[i]) ** 2).sum(-1)
        r2 = rho2 * d.min()
        cand = np.flatnonzero(d <= r2)
        if cand.size > k:
            cand = cand[np.argpartition(d[cand], k - 1)[:k]]
        got = np.sort(cand)
        m = got.size
        nbr[i, :m] = got
        nbr[i, m:] = -1
    return nbr
