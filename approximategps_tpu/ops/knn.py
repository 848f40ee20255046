"""Device-side blocked k-nearest-neighbor search.

The Vecchia serving path (``models.vecchia.predict_knn``) needs, for each
test point, the k nearest TRAINING points — a search over the full training
set, not the host-side predecessor searches of ``native/vecchia_order.cpp``
(those are greedy/sequential; this one is embarrassingly parallel, so it
belongs on the device).

TPU design, two tiers:

- **Blocked scan** (any dimension): (train, test) squared-distance tiles
  from the MXU distance identity (``core.kernels.pairwise_sq_dist``,
  precision="highest" per the numerics policy), per-tile top-k via exact
  segmented pruning + ``jax.lax.top_k``, running best-k merged across
  training tiles inside a ``lax.scan``.  The full (N, N*) distance matrix
  never exists; peak memory is O(train_block · test_block).
- **Grid buckets** (spatial D ≤ 3, the Vecchia serving case): training
  points are bucketed once into a static G^D grid sorted by cell id, so
  each test point gathers only the 3^D neighboring cells' points —
  contiguous ranges in the sorted order because the minor grid dimension
  is the minor sort key.  Exactness is *certified on device*: a result is
  provably exact when the k-th distance is ≤ the one-ring guarantee
  radius min_j(h_j) (every unsearched cell differs by ≥ 2 grid indices in
  some dim, hence lies ≥ h_j away) and no gathered range overflowed its
  static capacity; any tile with an uncertified point falls back to the
  blocked scan via ``lax.cond``.  Cost per test point drops from O(N) to
  O(3^D · occupancy) — at N=1e6/D=2 that is ~1500 candidates vs 1e6.

Everything is jittable with static shapes (grid resolution and capacities
are derived from the static (n, d, k) alone).
"""

from __future__ import annotations

import itertools
import math

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
    mode: str = "auto",
) -> tuple[jax.Array, jax.Array]:
    """Indices and squared distances of the k nearest training points for
    each test point.

    Returns ``(idx, d2)`` of shapes (N*, k), sorted ascending by distance.
    ``k`` must be ≤ len(Xtrain).  Blocked over both axes: scan over training
    tiles keeps a running best-k per test point (merge = top_k over the
    2k concatenated candidates), ``lax.map`` over test tiles bounds the
    live tile to (test_block, train_block).

    ``mode``: "scan" forces the blocked full sweep, "grid" forces the
    bucketed spatial path (D ≤ 3 only; tiles whose exactness certificate
    fails still fall back to the scan), "auto" picks grid for spatial
    problems large enough that the O(N)-per-point sweep dominates.
    Both paths return exact k-NN (up to distance ties).
    """
    Xa = as_points(Xtrain)
    Xb = as_points(Xtest)
    n, d = Xa.shape
    m = Xb.shape[0]
    if k > n:
        raise ValueError(f"k={k} exceeds the {n} training points")
    if mode not in ("auto", "grid", "scan"):
        raise ValueError(f"unknown knn mode: {mode!r}")
    if mode == "grid" and d > 3:
        # the documented contract is spatial D <= 3: beyond it the
        # 3^(d-1)-row Moore gather is untested and its capacity heuristic
        # was designed for the spatial regime (ADVICE r4) — fail loudly
        # rather than silently building it
        raise ValueError(
            f"knn mode='grid' supports spatial inputs with d <= 3, got d={d}"
        )
    dtype = Xa.dtype
    big = jnp.asarray(jnp.finfo(dtype).max, dtype)

    use_grid = mode == "grid" or (
        mode == "auto" and d <= 3 and n >= (1 << 17) and n >= 32 * k
    )

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
    # pad with a REAL test point (not zeros): padded rows then never fail
    # the grid path's exactness certificate spuriously
    Xb_p = (
        jnp.concatenate([Xb, jnp.broadcast_to(Xb[:1], (pad_m, d))])
        if pad_m
        else Xb
    )
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

    if use_grid:
        grid_tile = _make_grid_tile(Xa, k, big)
        if grid_tile is None and mode == "grid":
            # explicitly forced grid but no useful grid exists (degenerate
            # G, or the Moore gather would touch >= the whole sweep) —
            # signal the silent degradation instead of quietly running the
            # blocked scan (ADVICE r4)
            import warnings

            warnings.warn(
                "knn mode='grid' was forced but no useful grid exists for "
                f"this problem (n={n}, d={d}, k={k}); falling back to the "
                "blocked scan",
                RuntimeWarning,
                stacklevel=2,
            )
        if grid_tile is not None:

            def tile_fn(Q):
                idx_g, d2_g, certified = grid_tile(Q)
                return jax.lax.cond(
                    certified,
                    lambda: (idx_g, d2_g),
                    lambda: per_test_tile(Q),
                )

            idx, d2 = jax.lax.map(tile_fn, test_tiles)
            return idx.reshape(-1, k)[:m], d2.reshape(-1, k)[:m]

    idx, d2 = jax.lax.map(per_test_tile, test_tiles)
    idx = idx.reshape(-1, k)[:m]
    d2 = d2.reshape(-1, k)[:m]
    return idx, d2


def _make_grid_tile(Xa, k, big):
    """Build the bucketed-grid per-test-tile search over training points
    ``Xa`` (n, d≤3), or return None when no useful grid exists (degenerate
    sizes).  The returned closure maps a (sb, d) test tile to
    ``(idx (sb,k), d2 (sb,k), certified: bool scalar)`` where ``certified``
    proves the tile's results equal the exhaustive search (up to ties).

    Grid layout: G cells per dim (static, from n and the target occupancy),
    anisotropic cell extents h_j = span_j / G (traced).  Points are sorted
    by cell id with the LAST input dim as the minor key, so the 3-cell
    minor-dim window of any (3^{d-1}) neighbor row is one contiguous range
    of the sorted array.  Each test point gathers those ranges (static
    capacity per row), giving the 3^d-cell Moore neighborhood.

    Exactness certificate (per point, reduced over the tile): every
    unsearched cell differs from the test point's (clipped) cell by ≥ 2
    grid indices in some dim j, so every unsearched training point lies
    ≥ h_j ≥ min_j h_j away (this holds also for test points outside the
    bounding box: clipping only increases their distance to unsearched
    cells).  Hence the k-NN result is exact iff d_k ≤ min_j h_j and no
    gathered range overflowed its capacity.
    """
    n, d = Xa.shape
    lane = 128  # TPU lane width; all big gathers below move whole lane-rows
    # target ~max(2k, 64) points per cell; G cells per dim (static)
    occupancy = max(2 * k, 64)
    G = max(int(round((n / occupancy) ** (1.0 / d))), 1)
    if G < 4:
        return None
    ncells = G**d
    # lane-rows gathered per 3-cell minor-dim window: cover 2x the average
    # window population plus one row for range misalignment
    nblk = math.ceil(2 * 3 * (n / ncells) / lane) + 1
    n_rows = 3 ** (d - 1)
    C = n_rows * nblk * lane  # candidate slots per test point
    if C >= n or C < k:
        return None  # grid gathers no fewer candidates than the sweep

    dtype = Xa.dtype
    # TPU layout discipline: coordinates are d separate rank-1 columns
    # (a (…, d) layout would pad its size-d minor axis to 128 lanes), and
    # the per-test-point candidate gathers are ROW gathers of (nrb, 128)
    # views of the sorted columns — element-wise gathers of the same
    # candidates measured ~7 ns/element on v5e (60+ ms per 4096-point
    # tile); whole-row DMA is what makes the grid tier actually fast.
    cols = [Xa[:, j] for j in range(d)]
    lo = [jnp.min(c) for c in cols]
    hi = [jnp.max(c) for c in cols]
    # degenerate dims (constant coordinate) get unit extent: all points land
    # in cell 0 of that dim and the guarantee radius stays finite
    one = jnp.ones((), dtype)
    h = [jnp.where(hi[j] > lo[j], (hi[j] - lo[j]), one) / G for j in range(d)]

    def dim_cell(c, j):
        return jnp.clip(jnp.floor((c - lo[j]) / h[j]).astype(jnp.int32), 0, G - 1)

    cid = sum(dim_cell(cols[j], j) * (G ** (d - 1 - j)) for j in range(d))
    order = jnp.argsort(cid).astype(jnp.int32)
    starts = jnp.searchsorted(
        cid[order], jnp.arange(ncells + 1, dtype=jnp.int32)
    ).astype(jnp.int32)
    n128 = -(-n // lane) * lane
    nrb = n128 // lane
    pad_tail = jnp.zeros((n128 - n,), dtype) + big  # never a nearest point
    col_rows = [
        jnp.concatenate([c[order], pad_tail]).reshape(nrb, lane) for c in cols
    ]
    order_pad = jnp.concatenate(
        [order, jnp.zeros((n128 - n,), jnp.int32)]
    )

    # squared one-ring guarantee radius: unsearched cells differ by >= 2
    # grid indices in some NON-degenerate dim (degenerate dims put every
    # point in cell 0 and can never differ), so they lie >= min over the
    # non-degenerate h_j away; all-degenerate input means all points
    # coincide and the guarantee is vacuous (inf)
    inf = jnp.asarray(jnp.inf, dtype)
    guard2 = jnp.square(
        jnp.min(
            jnp.stack(
                [jnp.where(hi[j] > lo[j], h[j], inf) for j in range(d)]
            )
        )
    )

    def grid_tile(Q):  # (sb, d)
        sb = Q.shape[0]
        qcols = [Q[:, j] for j in range(d)]
        tc = [dim_cell(qcols[j], j) for j in range(d)]  # d x (sb,)
        x0 = jnp.maximum(tc[d - 1] - 1, 0)
        x1 = jnp.minimum(tc[d - 1] + 1, G - 1)

        blk_list, s_list, e_list, ok_list = [], [], [], []
        for off in itertools.product((-1, 0, 1), repeat=d - 1):
            row_ok = jnp.ones((sb,), bool)
            base = jnp.zeros((sb,), jnp.int32)
            for j, oj in enumerate(off):  # dims 0..d-2
                coord = tc[j] + oj
                row_ok = row_ok & (coord >= 0) & (coord < G)
                base = base + jnp.clip(coord, 0, G - 1) * (G ** (d - 1 - j))
            s = starts[base + x0]  # window [s, e) in the sorted order
            e = starts[base + x1 + 1]
            bb = s // lane
            blk_list.append(bb[:, None] + jnp.arange(nblk, dtype=jnp.int32)[None, :])
            s_list.append(s)
            e_list.append(e)
            ok_list.append(row_ok)

        blk = jnp.concatenate(blk_list, axis=1)  # (sb, n_rows*nblk)
        s_all = jnp.stack(s_list, axis=1)  # (sb, n_rows)
        e_all = jnp.stack(e_list, axis=1)
        ok_all = jnp.stack(ok_list, axis=1)
        # global sorted-order position of each candidate slot; clipped block
        # ids (tail) yield pos >= n128 > e, i.e. auto-invalid
        pos = blk[:, :, None] * lane + jnp.arange(lane, dtype=jnp.int32)  # (sb,R,128)
        posw = pos.reshape(sb, n_rows, nblk * lane)
        valid = (
            (posw >= s_all[:, :, None])
            & (posw < e_all[:, :, None])
            & ok_all[:, :, None]
        ).reshape(sb, C)
        blk_c = jnp.minimum(blk, nrb - 1)

        d2 = jnp.zeros((sb, C), dtype)
        for j in range(d):  # whole-row gathers: (sb, R) rows of 128 lanes
            g = col_rows[j][blk_c].reshape(sb, C)
            diff = g - qcols[j][:, None]
            d2 = d2 + diff * diff
        d2 = jnp.where(valid, d2, big)
        neg, jj = jax.lax.top_k(-d2, k)
        d2k = -neg
        flatpos = jnp.take_along_axis(pos.reshape(sb, C), jj, axis=1)
        idx = order_pad[jnp.minimum(flatpos, n128 - 1)]  # (sb, k) elements
        # a window overflows when [s, e) extends past its nblk gathered rows
        overflow = jnp.any(
            ok_all & (e_all > (s_all // lane + nblk) * lane), axis=1
        )
        certified = jnp.all((d2k[:, k - 1] <= guard2) & ~overflow)
        return idx, d2k, certified

    return grid_tile
