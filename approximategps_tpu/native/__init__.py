"""Native (C++) host-side components.

The TPU consumes gather indices; producing them (greedy orderings, neighbor
search) is sequential host work, implemented in C++ and exposed over a plain
C ABI via ctypes (no pybind11 in this environment).  Pure-numpy fallbacks
keep everything working when no compiler is available."""

from .ordering import (
    maximin_ordering,
    nearest_predecessor_neighbors,
    native_available,
    scaled_ball_predecessors,
)

__all__ = [
    "maximin_ordering",
    "nearest_predecessor_neighbors",
    "native_available",
    "scaled_ball_predecessors",
]
