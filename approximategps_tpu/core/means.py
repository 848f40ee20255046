"""Mean functions for GP priors (AbstractGPs' ZeroMean/ConstMean analogues)."""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from .kernels import as_points
from .pytrees import pytree_dataclass, static_field

__all__ = ["ZeroMean", "ConstMean", "FunctionMean"]


@pytree_dataclass
class ZeroMean:
    def __call__(self, X: jax.Array) -> jax.Array:
        X = as_points(X)
        return jnp.zeros((X.shape[0],), dtype=X.dtype)


@pytree_dataclass
class ConstMean:
    value: jax.Array = 0.0

    def __call__(self, X: jax.Array) -> jax.Array:
        X = as_points(X)
        return jnp.full((X.shape[0],), jnp.asarray(self.value, X.dtype), dtype=X.dtype)


@pytree_dataclass
class FunctionMean:
    fn: Callable = static_field()

    def __call__(self, X: jax.Array) -> jax.Array:
        X = as_points(X)
        out = jax.vmap(self.fn)(X)
        return out.reshape(X.shape[0])
