"""Pytree checkpoint/resume (SURVEY.md §5).

The reference has no checkpointing; its algorithmic analogue is the Laplace
warm-start cache persisting the Newton mode across objective calls
(``src/LaplaceApproximationModule.jl:91-93,119-127``).  Here: simple
msgpack-based pytree checkpoints (flax.serialization) for (hyperparams, m, L,
optimizer state, Newton-mode cache), with an orbax-compatible directory
layout option."""

from __future__ import annotations

import os
from typing import Any

import jax

__all__ = [
    "save_checkpoint",
    "restore_checkpoint",
    "latest_step",
    "AsyncCheckpointer",
]


def _path(ckpt_dir: str, step: int) -> str:
    return os.path.join(ckpt_dir, f"ckpt_{step:09d}.msgpack")


def save_checkpoint(ckpt_dir: str, target: Any, step: int) -> str:
    """Serialize a pytree to ``ckpt_dir/ckpt_<step>.msgpack``."""
    from flax import serialization

    os.makedirs(ckpt_dir, exist_ok=True)
    target = jax.device_get(target)
    path = _path(ckpt_dir, step)
    tmp = path + ".tmp"
    with open(tmp, "wb") as fh:
        fh.write(serialization.to_bytes(target))
    os.replace(tmp, path)
    return path


def latest_step(ckpt_dir: str) -> int | None:
    if not os.path.isdir(ckpt_dir):
        return None
    steps = [
        int(name[len("ckpt_") : -len(".msgpack")])
        for name in os.listdir(ckpt_dir)
        if name.startswith("ckpt_") and name.endswith(".msgpack")
    ]
    return max(steps) if steps else None


def restore_checkpoint(ckpt_dir: str, target: Any, step: int | None = None) -> Any:
    """Restore a pytree saved by :func:`save_checkpoint`.  ``target`` provides
    the structure (same-pytree template, e.g. freshly initialised params)."""
    from flax import serialization

    if step is None:
        step = latest_step(ckpt_dir)
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {ckpt_dir}")
    with open(_path(ckpt_dir, step), "rb") as fh:
        data = fh.read()
    return serialization.from_bytes(target, data)


class AsyncCheckpointer:
    """Asynchronous checkpointing: ``save()`` hands the (immutable) device
    arrays to a background thread and returns immediately, so the
    host→disk transfer overlaps training compute — the orbax
    AsyncCheckpointer pattern, over the same msgpack format as
    :func:`save_checkpoint` (restore with :func:`restore_checkpoint`).

    At most ``max_pending`` saves are in flight; an extra ``save`` blocks
    until a slot frees (backpressure instead of unbounded host memory).
    Call ``wait()`` to make all writes durable (e.g. before evaluating or
    exiting); the context-manager form does this on exit.

    JAX arrays are immutable, so capturing them at ``save()`` time and
    fetching (``jax.device_get``) inside the worker is race-free even while
    the training loop keeps updating its own references."""

    def __init__(self, ckpt_dir: str, max_pending: int = 1):
        import concurrent.futures

        self.ckpt_dir = ckpt_dir
        self._pool = concurrent.futures.ThreadPoolExecutor(max_workers=1)
        self._pending: list = []
        self._max_pending = max(1, int(max_pending))

    def _drain(self, keep: int):
        while len(self._pending) > keep:
            fut = self._pending.pop(0)
            fut.result()  # re-raises worker exceptions

    def save(self, target: Any, step: int):
        """Schedule an asynchronous checkpoint of ``target`` at ``step``."""
        self._drain(self._max_pending - 1)
        fut = self._pool.submit(save_checkpoint, self.ckpt_dir, target, step)
        self._pending.append(fut)
        return fut

    def wait(self):
        """Block until every scheduled checkpoint is durably on disk."""
        self._drain(0)

    def close(self):
        self.wait()
        self._pool.shutdown()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
