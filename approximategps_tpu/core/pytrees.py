"""Pytree dataclass infrastructure.

The reference library (ApproximateGPs.jl) builds its objects out of Julia
structs dispatched on by type (e.g. ``SparseVariationalApproximation{P,Tfz,Tq}``
at ``src/SparseVariationalApproximationModule.jl:59-62``).  The TPU-native
equivalent is a frozen dataclass registered as a JAX pytree so that every
model object (kernels, GPs, approximations, caches) can flow through
``jax.jit`` / ``jax.grad`` / ``jax.vmap`` directly, with hyperparameters as
differentiable leaves and structural choices as static metadata.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, TypeVar

import jax

T = TypeVar("T")

__all__ = ["pytree_dataclass", "static_field", "field"]


def static_field(**kwargs: Any) -> dataclasses.Field:
    """A dataclass field treated as static pytree metadata (not traced)."""
    metadata = dict(kwargs.pop("metadata", {}) or {})
    metadata["static"] = True
    return dataclasses.field(metadata=metadata, **kwargs)


def field(**kwargs: Any) -> dataclasses.Field:
    """A regular (traced, differentiable) dataclass field."""
    return dataclasses.field(**kwargs)


def pytree_dataclass(cls: type[T] | None = None) -> Callable[[type[T]], type[T]] | type[T]:
    """Decorator: frozen dataclass registered as a JAX pytree.

    Fields declared with :func:`static_field` become pytree metadata (they
    must be hashable); all other fields are pytree children.
    """

    def wrap(c: type[T]) -> type[T]:
        c = dataclasses.dataclass(frozen=True, eq=False, repr=True)(c)
        data_fields = []
        meta_fields = []
        for f in dataclasses.fields(c):
            if f.metadata.get("static", False):
                meta_fields.append(f.name)
            else:
                data_fields.append(f.name)
        jax.tree_util.register_dataclass(
            c, data_fields=data_fields, meta_fields=meta_fields
        )
        # `replace` convenience mirroring dataclasses.replace
        if not hasattr(c, "replace"):
            c.replace = lambda self, **kw: dataclasses.replace(self, **kw)
        return c

    if cls is None:
        return wrap
    return wrap(cls)
