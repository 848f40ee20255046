"""Device-side blocked k-nearest-neighbor search.

The Vecchia serving path (``models.vecchia.predict_knn``) needs, for each
test point, the k nearest TRAINING points — a search over the full training
set, not the host-side predecessor searches of ``native/vecchia_order.cpp``
(those are greedy/sequential; this one is embarrassingly parallel, so it
belongs on the device).

TPU design: the (train, test) squared-distance tiles come from the MXU
distance identity (``core.kernels.pairwise_sq_dist``, precision="highest"
per the numerics policy), the per-tile top-k from ``jax.lax.top_k`` on the
VPU, and the running best-k across training tiles is maintained by a
top-k merge inside a ``lax.scan`` — the full (N, N*) distance matrix never
exists; peak memory is O(train_block · test_block).  Everything is
jittable with static shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.kernels import as_points, pairwise_sq_dist

__all__ = ["knn_search"]


def knn_search(
    Xtrain: jax.Array,
    Xtest: jax.Array,
    k: int,
    train_block: int = 65536,
    test_block: int = 4096,
) -> tuple[jax.Array, jax.Array]:
    """Indices and squared distances of the k nearest training points for
    each test point.

    Returns ``(idx, d2)`` of shapes (N*, k), sorted ascending by distance.
    ``k`` must be ≤ len(Xtrain).  Blocked over both axes: scan over training
    tiles keeps a running best-k per test point (merge = top_k over the
    2k concatenated candidates), ``lax.map`` over test tiles bounds the
    live tile to (test_block, train_block).
    """
    Xa = as_points(Xtrain)
    Xb = as_points(Xtest)
    n, d = Xa.shape
    m = Xb.shape[0]
    if k > n:
        raise ValueError(f"k={k} exceeds the {n} training points")
    dtype = Xa.dtype
    big = jnp.asarray(jnp.finfo(dtype).max, dtype)

    tb = min(train_block, n)
    pad_n = (-n) % tb
    if pad_n:
        Xa_p = jnp.concatenate([Xa, jnp.zeros((pad_n, d), dtype)])
    else:
        Xa_p = Xa
    n_pad = n + pad_n
    train_tiles = Xa_p.reshape(-1, tb, d)
    # padded rows must never win the top-k: give them +inf distance
    tile_valid = (jnp.arange(n_pad) < n).reshape(-1, tb)
    tile_base = jnp.arange(train_tiles.shape[0]) * tb

    sb = min(test_block, m)
    pad_m = (-m) % sb
    Xb_p = jnp.concatenate([Xb, jnp.zeros((pad_m, d), dtype)]) if pad_m else Xb
    test_tiles = Xb_p.reshape(-1, sb, d)

    # Exact segmented pruning for the per-tile top-k: lax.top_k over the
    # full (sb, tb=65536) tile is the sweep's dominant cost (measured
    # ~127 µs/test point at N=1e6 — the distance matmul itself is ~0.1 µs).
    # Split the tile into segments of ``seg``; the k segments with the
    # smallest MINIMUM provably contain every true top-k point (a top-k
    # point's segment has min ≤ its distance ≤ d_k ≤ the k-th smallest
    # segment-min), so the top-k runs over k·seg gathered candidates
    # instead of tb.  Exact up to distance TIES at the segment boundary
    # (a tied point may be swapped for an equal-distance one).
    seg = 64

    def tile_topk(d2):  # (sb, tb) → (neg_d2 (sb,k), j (sb,k) tile-local)
        tb_ = d2.shape[1]
        if tb_ % seg or tb_ < 4 * k * seg:
            return jax.lax.top_k(-d2, k)
        S = tb_ // seg
        d2r = d2.reshape(d2.shape[0], S, seg)
        segmin = jnp.min(d2r, axis=2)  # (sb, S)
        _, sidx = jax.lax.top_k(-segmin, k)  # (sb, k) segment ids
        cand = jnp.take_along_axis(d2r, sidx[:, :, None], axis=1)
        neg_d2, jloc = jax.lax.top_k(-cand.reshape(d2.shape[0], k * seg), k)
        seg_of = jloc // seg
        j = jnp.take_along_axis(sidx, seg_of, axis=1) * seg + jloc % seg
        return neg_d2, j

    def per_test_tile(Q):  # (sb, d)
        def step(carry, tile):
            best_d2, best_idx = carry  # (sb, k) each
            Xt, valid, base = tile
            d2 = pairwise_sq_dist(Q, Xt)  # (sb, tb) — MXU identity
            d2 = jnp.where(valid[None, :], d2, big)
            # per-tile top-k (negate: top_k is max-k), then merge with the
            # running best via a top-k over the 2k concatenated candidates
            neg_d2, j = tile_topk(d2)  # (sb, k)
            cand_d2 = jnp.concatenate([best_d2, -neg_d2], axis=1)
            cand_idx = jnp.concatenate(
                [best_idx, (base + j).astype(jnp.int32)], axis=1
            )
            neg_m, pos = jax.lax.top_k(-cand_d2, k)
            merged_idx = jnp.take_along_axis(cand_idx, pos, axis=1)
            return (-neg_m, merged_idx), None

        init = (
            jnp.full((sb, k), big, dtype),
            jnp.zeros((sb, k), jnp.int32),
        )
        (d2_out, idx_out), _ = jax.lax.scan(
            step, init, (train_tiles, tile_valid, tile_base)
        )
        return idx_out, d2_out

    idx, d2 = jax.lax.map(per_test_tile, test_tiles)
    idx = idx.reshape(-1, k)[:m]
    d2 = d2.reshape(-1, k)[:m]
    return idx, d2
