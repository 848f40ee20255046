"""Data-parallel training over a TPU device mesh (SURVEY.md §2.4).

The reference has no parallelism infrastructure; the one enabling hook is
the minibatch ELBO scale ``num_data / n_batch``
(``src/SparseVariationalApproximationModule.jl:357-359``).  Because the
ELBO's data term is a sum of independent per-point expectations, it is
embarrassingly data-parallel: shard ``(x, y)`` across chips, compute partial
sums, ``psum`` over ICI; variational parameters ``(m, L)`` and kernel
hyperparameters stay replicated.  Implemented with ``jax.sharding``
``NamedSharding`` + jit — XLA inserts the collectives."""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "data_mesh",
    "shard_batch",
    "replicated",
    "make_dp_elbo",
    "make_dp_train_step",
]


def data_mesh(devices=None, axis_name: str = "data") -> Mesh:
    """1-D mesh over all (or given) devices — collectives ride ICI."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def shard_batch(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Sharding for per-point arrays: leading dim split across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _put(tree, sharding):
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, sharding), tree)


def make_dp_elbo(elbo_fn: Callable, mesh: Mesh, axis_name: str = "data"):
    """Wrap an ``elbo_fn(params, x_batch, y_batch)`` into a jitted
    data-parallel version: inputs sharded over ``axis_name``, params
    replicated, result fully reduced.

    ``elbo_fn`` must be written as a plain per-batch function (the library's
    ``elbo`` already is); XLA turns the global reductions into psums."""
    batch_sh = shard_batch(mesh, axis_name)
    rep = replicated(mesh)

    jitted = jax.jit(
        elbo_fn,
        in_shardings=(rep, batch_sh, batch_sh),
        out_shardings=rep,
    )

    def run(params, x, y):
        return jitted(_put(params, rep), _put(x, batch_sh), _put(y, batch_sh))

    return run


def make_dp_train_step(
    loss_fn: Callable,
    optimizer: Any,
    mesh: Mesh,
    axis_name: str = "data",
    donate: bool = True,
):
    """Build a jitted data-parallel training step.

    ``loss_fn(params, x_batch, y_batch) -> scalar`` (e.g. negative minibatch
    ELBO).  Returns ``step(params, opt_state, x, y) -> (params, opt_state,
    loss)`` with (x, y) sharded over the mesh and params/opt_state
    replicated; gradients are globally reduced by XLA (psum over ICI)."""
    batch_sh = shard_batch(mesh, axis_name)
    rep = replicated(mesh)

    def step(params, opt_state, x, y):
        loss, grads = jax.value_and_grad(loss_fn)(params, x, y)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        return params, opt_state, loss

    jitted = jax.jit(
        step,
        in_shardings=(rep, rep, batch_sh, batch_sh),
        out_shardings=(rep, rep, rep),
        donate_argnums=(0, 1) if donate else (),
    )

    def run(params, opt_state, x, y):
        return jitted(
            _put(params, rep), _put(opt_state, rep), _put(x, batch_sh), _put(y, batch_sh)
        )

    return run
