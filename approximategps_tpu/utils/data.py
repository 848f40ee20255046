"""Minibatch data loading (the reference delegates to Flux.DataLoader,
``examples/a-regression/script.jl:176``).

TPU-shaped: batches are cut on-device from device-resident arrays with a
permutation refreshed per epoch (gathers are cheap on HBM; no host round
trips), or streamed as one `lax.scan` epoch via :func:`epoch_batches`."""

from __future__ import annotations

from typing import Iterator, Sequence

import jax
import jax.numpy as jnp

__all__ = ["minibatch_iterator", "epoch_batches"]


def minibatch_iterator(
    key: jax.Array,
    arrays: Sequence[jax.Array],
    batch_size: int,
    epochs: int | None = None,
    shuffle: bool = True,
    drop_remainder: bool = True,
) -> Iterator[tuple[jax.Array, ...]]:
    """Yield tuples of aligned minibatches, reshuffled every epoch.

    ``epochs=None`` iterates forever (use with ``itertools.islice`` or a
    step-counted loop)."""
    n = arrays[0].shape[0]
    if not drop_remainder and n % batch_size != 0:
        raise ValueError("non-multiple batch sizes require drop_remainder=True")
    n_batches = n // batch_size
    epoch = 0
    while epochs is None or epoch < epochs:
        if shuffle:
            key, sub = jax.random.split(key)
            perm = jax.random.permutation(sub, n)
        else:
            perm = jnp.arange(n)
        for b in range(n_batches):
            idx = jax.lax.dynamic_slice_in_dim(perm, b * batch_size, batch_size)
            yield tuple(a[idx] for a in arrays)
        epoch += 1


def epoch_batches(key: jax.Array, n: int, batch_size: int) -> jax.Array:
    """A (n_batches, batch_size) permutation index array for one epoch — feed
    to ``lax.scan`` for a fully on-device training epoch."""
    perm = jax.random.permutation(key, n)
    n_batches = n // batch_size
    return perm[: n_batches * batch_size].reshape(n_batches, batch_size)
