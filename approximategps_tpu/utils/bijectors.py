"""Constrained-parameter transforms (L7 of SURVEY.md §1).

The reference delegates these to user-side ParameterHandling.jl /
LogExpFunctions (``softplus``/``invsoftplus`` at
``examples/a-regression/script.jl:54-64``, ``positive_definite`` at
``examples/b-classification/script.jl:91``).  Shipped here as first-class
utilities since optax training loops need them."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "softplus",
    "invsoftplus",
    "positive",
    "fill_triangular",
    "fill_triangular_inverse",
    "tril_from_flat",
    "flat_from_tril",
    "cholesky_parameter",
]


def softplus(x):
    return jax.nn.softplus(x)


def invsoftplus(y):
    """Inverse of softplus: log(exp(y) - 1), numerically stable."""
    y = jnp.asarray(y)
    return y + jnp.log(-jnp.expm1(-y))


positive = softplus


def _tril_indices(n: int):
    return np.tril_indices(n)


def fill_triangular(flat: jax.Array, n: int) -> jax.Array:
    """Pack a length n(n+1)/2 vector into a lower-triangular (n, n) matrix
    (row-major over the lower triangle)."""
    rows, cols = _tril_indices(n)
    L = jnp.zeros((n, n), dtype=flat.dtype)
    return L.at[rows, cols].set(flat)


def fill_triangular_inverse(L: jax.Array) -> jax.Array:
    n = L.shape[-1]
    rows, cols = _tril_indices(n)
    return L[rows, cols]


tril_from_flat = fill_triangular
flat_from_tril = fill_triangular_inverse


def cholesky_parameter(flat: jax.Array, n: int) -> jax.Array:
    """Unconstrained vector → valid Cholesky factor: lower-triangular with
    softplus-positive diagonal (ParameterHandling.positive_definite)."""
    L = fill_triangular(flat, n)
    diag = jax.nn.softplus(jnp.diagonal(L))
    return jnp.tril(L, -1) + jnp.diag(diag)
