"""Unified top-level API (L5 of SURVEY.md §1).

The reference declares one open generic ``approx_lml(approx, lfx, ys)``
(``src/API.jl:13``) plus ``posterior(approx, lfx, ys)`` extended from
AbstractGPs, and each approximation module adds methods.  Python version:
single-dispatch on the approximation object's type; modules register
themselves via :func:`register`.
"""

from __future__ import annotations

from functools import singledispatch
from typing import Any

__all__ = ["posterior", "approx_lml"]


@singledispatch
def posterior(approx: Any, *args, **kwargs):
    """posterior(approx, lfx, ys): approximate posterior to ``lfx`` given
    observations ``ys`` under approximation ``approx``.

    Also callable with exact-GP signature ``posterior(fx, ys)`` — dispatches
    to exact GP regression when ``approx`` is a FiniteGP."""
    raise NotImplementedError(
        f"posterior not implemented for approximation {type(approx).__name__}"
    )


@singledispatch
def approx_lml(approx: Any, *args, **kwargs):
    """approx_lml(approx, lfx, ys): approximation to the log marginal
    likelihood ("evidence"), for hyperparameter optimisation
    (reference: ``src/API.jl:6-13``)."""
    raise NotImplementedError(
        f"approx_lml not implemented for approximation {type(approx).__name__}"
    )


def _register_exact():
    # posterior(fx, y) for exact GP regression, matching AbstractGPs usage.
    from ..core.gp import FiniteGP
    from ..core.gp import posterior as exact_posterior

    @posterior.register(FiniteGP)
    def _(fx: FiniteGP, y, **kwargs):
        return exact_posterior(fx, y)


_register_exact()
