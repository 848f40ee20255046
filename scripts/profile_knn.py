#!/usr/bin/env python
"""Locate the dominant cost inside ops/knn.knn_search on the real TPU.

Times, at N=1e6 train / small test tiles, the isolated stages:
  (a) full knn_search
  (b) distance matmul + mask only (scan, reduced to scalar)
  (c) + segment-min reduce
  (d) + segment top-k (no candidate gather)
  (e) + candidate gather + final top-k (== full tile_topk)
Chained-scan timing per CLAUDE.md (tunnel: no block_until_ready).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from approximategps_tpu.core.kernels import pairwise_sq_dist

N = int(os.environ.get("KNN_N", "1000000"))
M = int(os.environ.get("KNN_M", "8192"))
D = int(os.environ.get("KNN_D", "8"))
K = int(os.environ.get("KNN_K", "32"))
TB = int(os.environ.get("KNN_TB", "65536"))
SEG = 64

rng = np.random.default_rng(0)
N = (N // TB) * TB  # the stage harness scans whole tiles only
Xa = jnp.asarray(rng.standard_normal((N, D)), jnp.float32)
Xb = jnp.asarray(rng.standard_normal((M, D)), jnp.float32)


def timed(fn, *args, inner=2):
    """Chained-scan timing: run fn reduced to scalar, difference 1 vs 1+inner."""
    jfn = jax.jit(fn)
    out = float(jfn(*args))  # compile + 1
    t0 = time.perf_counter()
    out = float(jfn(*args))
    t1 = time.perf_counter()
    for _ in range(inner):
        out = float(jfn(*args))
    t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / max(inner - 1, 1) * 1e3, out


big = jnp.float32(np.finfo(np.float32).max)
tiles = N // TB


def scan_stage(stage):
    def fn(Xa, Xb):
        Xt = Xa.reshape(tiles, TB, D)

        def step(acc, xt):
            d2 = pairwise_sq_dist(Xb, xt)
            if stage == "matmul":
                return acc + jnp.sum(d2[:, ::997]), None
            S = TB // SEG
            d2r = d2.reshape(M, S, SEG)
            segmin = jnp.min(d2r, axis=2)
            if stage == "segmin":
                return acc + jnp.sum(segmin[:, ::37]), None
            neg, sidx = jax.lax.top_k(-segmin, K)
            if stage == "segtopk":
                return acc + jnp.sum(neg) + jnp.sum(sidx[:, 0]), None
            cand = jnp.take_along_axis(d2r, sidx[:, :, None], axis=1)
            neg2, jloc = jax.lax.top_k(-cand.reshape(M, K * SEG), K)
            return acc + jnp.sum(neg2), None

        acc, _ = jax.lax.scan(step, jnp.float32(0), Xt)
        return acc

    return fn


def full(Xa, Xb):
    from approximategps_tpu.ops.knn import knn_search

    idx, d2 = knn_search(Xa, Xb, K, TB, M)
    return jnp.sum(d2) + jnp.sum(idx[:, 0])


print(f"backend={jax.default_backend()} N={N} M={M} D={D} K={K} TB={TB}")
for name in ["matmul", "segmin", "segtopk", "cand"]:
    ms, _ = timed(scan_stage(name), Xa, Xb)
    print(f"{name:8s}: {ms:8.2f} ms  ({ms / M * 1e3:6.2f} us/pt)")
ms, _ = timed(full, Xa, Xb)
print(f"{'full':8s}: {ms:8.2f} ms  ({ms / M * 1e3:6.2f} us/pt)")
