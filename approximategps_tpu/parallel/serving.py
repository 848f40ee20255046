"""Scale-out posterior serving over a TPU device mesh (SURVEY.md §2.4).

The reference's predictive stack is single-process
(``src/SparseVariationalApproximationModule.jl:246-264``); here prediction
is embarrassingly data-parallel: the posterior cache (M-sized arrays) is
replicated across chips, the test points are sharded over the mesh's data
axis, and every chip runs the blocked serving sweep on its shard — on TPU
through the fused Pallas data-term epilogue, so per-chip HBM traffic stays
O(N*·(D+2)/n_dev).  No collectives are needed in the forward sweep at all
(outputs stay sharded); XLA only inserts transfers if the caller gathers.

Throughput model (v5e): the single-chip sweep measures 64.4 ms per 1e6
test points at M=2048 (bench.py ``svgp_predict_sweep``); n chips serve
n·15.5M points/s with zero ICI cost until the caller gathers the
mean/var shards.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..core.kernels import as_points

__all__ = ["dp_predict_blocks"]


def dp_predict_blocks(
    f_post,
    xs,
    mesh,
    axis_name: str = "data",
    block_size: int = 16384,
):
    """(mean, var) of ``f_post`` at ``xs``, sharded over ``mesh``.

    ``f_post`` is any posterior pytree exposing ``predict_blocks`` (the
    blocked serving sweep — SVGP's routes each block through the fused
    Pallas epilogue on TPU) or, failing that, ``mean_and_var``; its arrays
    are replicated to every device.  ``xs`` is padded to a device multiple
    (pad rows are computed and discarded), sharded over ``axis_name``, and
    the returned (mean, var) are global arrays still sharded over the mesh
    — index or ``jax.device_get`` them to gather.
    """
    X = as_points(xs)
    n = X.shape[0]
    n_dev = mesh.devices.size
    pad = (-n) % n_dev
    Xp = (
        jnp.concatenate([X, jnp.broadcast_to(X[:1], (pad, X.shape[1]))])
        if pad
        else X
    )
    shard_n = Xp.shape[0] // n_dev

    def local(post, x_loc):
        if hasattr(post, "predict_blocks"):
            return post.predict_blocks(
                x_loc, block_size=min(block_size, shard_n)
            )
        return post.mean_and_var(x_loc)

    mu, var = jax.jit(
        jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(P(), P(axis_name)),
            out_specs=(P(axis_name), P(axis_name)),
        )
    )(f_post, Xp)
    return mu[:n], var[:n]
