"""Kernel library + Gram construction (L1 of SURVEY.md §1).

The reference imports this layer wholesale from KernelFunctions.jl
(``kernelmatrix``, ``with_lengthscale``, ``ScaleTransform``, SE/Matérn
kernels — see usage at ``src/NearestNeighborsModule.jl:28,56`` and
``src/TestUtils.jl:35``).  Built from scratch here, TPU-first:

- kernels are pytree dataclasses; their hyperparameters (variance,
  lengthscale, ...) are differentiable leaves,
- Gram matrices are built from pairwise squared distances computed either by
  exact broadcasting (accuracy / f64 oracle mode) or by the MXU-friendly
  ``|x|² + |z|² − 2·x zᵀ`` matmul form, or by a fused Pallas tile kernel
  (distance + elementwise kernel map in one VMEM pass),
- inputs are arrays of shape (N,) or (N, D) — the JAX analogue of
  KernelFunctions' vectors-of-points / ``ColVecs``.
"""

from __future__ import annotations

import abc
from typing import Callable

import jax
import jax.numpy as jnp

from ..config import config
from .pytrees import pytree_dataclass, static_field

__all__ = [
    "Kernel",
    "StationaryKernel",
    "SqExponentialKernel",
    "SEKernel",
    "RBFKernel",
    "Matern12Kernel",
    "ExponentialKernel",
    "Matern32Kernel",
    "Matern52Kernel",
    "RationalQuadraticKernel",
    "PeriodicKernel",
    "WhiteKernel",
    "ConstantKernel",
    "LinearKernel",
    "PolynomialKernel",
    "ScaledKernel",
    "InputScaledKernel",
    "SumKernel",
    "ProductKernel",
    "with_lengthscale",
    "ScaleTransform",
    "pairwise_sq_dist",
    "as_points",
]


def as_points(X: jax.Array) -> jax.Array:
    """Canonicalize inputs to shape (N, D)."""
    X = jnp.asarray(X)
    if X.ndim == 0:
        return X.reshape(1, 1)
    if X.ndim == 1:
        return X[:, None]
    if X.ndim == 2:
        return X
    raise ValueError(f"kernel inputs must be (N,) or (N, D); got shape {X.shape}")


def _resolve_gram_mode(n: int, m: int, d: int) -> str:
    mode = config.gram_mode
    if mode == "auto":
        if n * m * d >= config.gram_auto_threshold:
            return "mxu"
        return "broadcast"
    return mode


def pairwise_sq_dist(X: jax.Array, Z: jax.Array, mode: str | None = None) -> jax.Array:
    """Pairwise squared Euclidean distances, shape (N, M).

    ``broadcast`` is numerically exact (differences squared); ``mxu`` uses the
    matmul identity so the O(N·M·D) work lands on the systolic array.
    """
    X = as_points(X)
    Z = as_points(Z)
    if mode is None:
        mode = _resolve_gram_mode(X.shape[0], Z.shape[0], X.shape[1])
    if mode == "broadcast":
        diff = X[:, None, :] - Z[None, :, :]
        return jnp.sum(diff * diff, axis=-1)
    # MXU path: |x|^2 + |z|^2 - 2 x.z.  Always full f32 precision: the
    # distance matmul is O(N·M·D) — negligible next to the O(M²·N)
    # projection matmuls — and bf16 distance errors (~1e-2) destroy the
    # PSD-ness of jittered Gram matrices downstream.  The identity's error
    # scales with eps·max|x|², so center the inputs first (distances are
    # translation-invariant) — otherwise data on, say, [0, 100] loses ~1e-3
    # absolute accuracy in f32 and Cholesky factorizations go NaN.
    prec = "highest"
    center = 0.5 * (jnp.mean(X, axis=0) + jnp.mean(Z, axis=0))
    X = X - center
    Z = Z - center
    xz = jnp.matmul(X, Z.T, precision=prec)
    x2 = jnp.sum(X * X, axis=-1)
    z2 = jnp.sum(Z * Z, axis=-1)
    r2 = x2[:, None] + z2[None, :] - 2.0 * xz
    return jnp.maximum(r2, 0.0)


class Kernel:
    """Base class for covariance kernels.

    Subclasses implement ``gram(X, Z)`` (full cross-covariance matrix) and
    ``diag(X)``; ``__call__(x, z)`` evaluates the kernel on two single points.
    """

    def gram(self, X: jax.Array, Z: jax.Array | None = None) -> jax.Array:
        raise NotImplementedError

    def diag(self, X: jax.Array) -> jax.Array:
        raise NotImplementedError

    def __call__(self, x: jax.Array, z: jax.Array) -> jax.Array:
        x = jnp.asarray(x)
        z = jnp.asarray(z)
        K = self.gram(jnp.atleast_1d(x).reshape(1, -1), jnp.atleast_1d(z).reshape(1, -1))
        return K[0, 0]

    # -- combinators ------------------------------------------------------
    def __add__(self, other):
        if isinstance(other, Kernel):
            return SumKernel(self, other)
        return SumKernel(self, ConstantKernel(jnp.asarray(other)))

    __radd__ = __add__

    def __mul__(self, other):
        if isinstance(other, Kernel):
            return ProductKernel(self, other)
        return ScaledKernel(self, jnp.asarray(other))

    __rmul__ = __mul__


class StationaryKernel(Kernel):
    """Kernels of the form k(x, z) = g(||x - z||^2)."""

    @abc.abstractmethod
    def k_of_r2(self, r2: jax.Array) -> jax.Array:
        """Elementwise kernel map on squared distances."""

    def _static_k_of_r2(self):
        """The elementwise map as a static (parameter-free) function, or None.

        Parameter-free stationary kernels expose ``k_of_r2`` as a
        staticmethod so the Pallas path keeps a warm jit cache; kernels whose
        map closes over traced parameters fall back to the MXU jnp path."""
        raw = type(self).__dict__.get("k_of_r2")
        if isinstance(raw, staticmethod):
            return raw.__func__
        return None

    def gram(self, X: jax.Array, Z: jax.Array | None = None) -> jax.Array:
        X = as_points(X)
        symmetric = Z is None
        Z = X if symmetric else as_points(Z)
        mode = _resolve_gram_mode(X.shape[0], Z.shape[0], X.shape[1])
        if symmetric and mode in ("mxu", "pallas"):
            # symmetric Grams feed Cholesky factorizations: the |x|²-identity
            # loses eps·max|x−c|² absolute accuracy, which breaks PSD-ness
            # whenever the data span ≫ jitter^{1/2}; always use the exact
            # broadcast distances here (the O(M²·D) cost is negligible next
            # to the O(M³)/O(M²·N) consumers).
            mode = "broadcast"
        if mode == "pallas":
            static_fn = self._static_k_of_r2()
            if static_fn is not None:
                from ..ops.gram import pallas_stationary_gram

                return pallas_stationary_gram(X, Z, static_fn)
            mode = "mxu"
        r2 = pairwise_sq_dist(X, Z, mode)
        return self.k_of_r2(r2)

    def diag(self, X: jax.Array) -> jax.Array:
        X = as_points(X)
        z = jnp.zeros((), dtype=X.dtype)
        return jnp.full((X.shape[0],), self.k_of_r2(z), dtype=X.dtype)


def _safe_r(r2: jax.Array) -> jax.Array:
    """sqrt(r2) with a zero-safe gradient (standard double-where trick)."""
    safe = jnp.where(r2 > 0, r2, jnp.ones_like(r2))
    return jnp.where(r2 > 0, jnp.sqrt(safe), jnp.zeros_like(r2))


@pytree_dataclass
class SqExponentialKernel(StationaryKernel):
    """k(x,z) = exp(-||x-z||^2 / 2) — KernelFunctions.SqExponentialKernel."""

    @staticmethod
    def k_of_r2(r2):
        return jnp.exp(-0.5 * r2)

    @staticmethod
    def dk_from_k(k):
        """g'(r²) expressed through g(r²) — lets fused-kernel backwards
        reuse a stored K tile instead of rebuilding r² and re-running the
        transcendental map."""
        return -0.5 * k


SEKernel = SqExponentialKernel
RBFKernel = SqExponentialKernel


@pytree_dataclass
class Matern12Kernel(StationaryKernel):
    """k(x,z) = exp(-||x-z||) (exponential / Ornstein-Uhlenbeck)."""

    @staticmethod
    def k_of_r2(r2):
        return jnp.exp(-_safe_r(r2))


ExponentialKernel = Matern12Kernel


@pytree_dataclass
class Matern32Kernel(StationaryKernel):
    """k(x,z) = (1 + √3 r) exp(-√3 r) — KernelFunctions.Matern32Kernel."""

    @staticmethod
    def k_of_r2(r2):
        sqrt3 = jnp.asarray(3.0, dtype=r2.dtype) ** 0.5
        t = sqrt3 * _safe_r(r2)
        return (1.0 + t) * jnp.exp(-t)


@pytree_dataclass
class Matern52Kernel(StationaryKernel):
    """k(x,z) = (1 + √5 r + 5r²/3) exp(-√5 r) — KernelFunctions.Matern52Kernel."""

    @staticmethod
    def k_of_r2(r2):
        sqrt5 = jnp.asarray(5.0, dtype=r2.dtype) ** 0.5
        t = sqrt5 * _safe_r(r2)
        return (1.0 + t + (5.0 / 3.0) * r2) * jnp.exp(-t)


@pytree_dataclass
class RationalQuadraticKernel(StationaryKernel):
    """k(x,z) = (1 + r²/(2α))^{-α}."""

    alpha: jax.Array = 2.0

    def k_of_r2(self, r2):
        a = jnp.asarray(self.alpha, dtype=r2.dtype)
        return (1.0 + r2 / (2.0 * a)) ** (-a)


@pytree_dataclass
class PeriodicKernel(StationaryKernel):
    """1-D periodic (MacKay) kernel: exp(-2 sin²(π r / p))."""

    period: jax.Array = 1.0

    def k_of_r2(self, r2):
        r = _safe_r(r2)
        p = jnp.asarray(self.period, dtype=r2.dtype)
        s = jnp.sin(jnp.pi * r / p)
        return jnp.exp(-2.0 * s * s)


@pytree_dataclass
class WhiteKernel(Kernel):
    """k(x,z) = δ(x == z) — elementwise point equality, matching
    KernelFunctions' WhiteKernel delta semantics.  One-argument ``gram(X)``
    is the identity (by index, like the reference); two-argument grams
    compare point values so shared points between X and Z still hit."""

    def gram(self, X, Z=None):
        X = as_points(X)
        if Z is None:
            return jnp.eye(X.shape[0], dtype=X.dtype)
        Z = as_points(Z)
        eq = jnp.all(X[:, None, :] == Z[None, :, :], axis=-1)
        return eq.astype(X.dtype)

    def diag(self, X):
        X = as_points(X)
        return jnp.ones((X.shape[0],), dtype=X.dtype)


@pytree_dataclass
class ConstantKernel(Kernel):
    value: jax.Array = 1.0

    def gram(self, X, Z=None):
        X = as_points(X)
        Z = X if Z is None else as_points(Z)
        v = jnp.asarray(self.value, dtype=X.dtype)
        return jnp.full((X.shape[0], Z.shape[0]), v, dtype=X.dtype)

    def diag(self, X):
        X = as_points(X)
        return jnp.full((X.shape[0],), jnp.asarray(self.value, X.dtype), dtype=X.dtype)


@pytree_dataclass
class LinearKernel(Kernel):
    """k(x,z) = x·z."""

    def gram(self, X, Z=None):
        X = as_points(X)
        Z = X if Z is None else as_points(Z)
        # Gram-construction matmuls are ALWAYS full precision (same policy
        # as pairwise_sq_dist): bf16 error here breaks PSD-ness of the
        # symmetric Grams that feed Cholesky downstream.
        return jnp.matmul(X, Z.T, precision="highest")

    def diag(self, X):
        X = as_points(X)
        return jnp.sum(X * X, axis=-1)


@pytree_dataclass
class PolynomialKernel(Kernel):
    """k(x,z) = (x·z + c)^degree."""

    degree: int = static_field(default=2)
    c: jax.Array = 0.0

    def gram(self, X, Z=None):
        X = as_points(X)
        Z = X if Z is None else as_points(Z)
        base = jnp.matmul(X, Z.T, precision="highest")  # PSD policy, as above
        return (base + jnp.asarray(self.c, X.dtype)) ** self.degree

    def diag(self, X):
        X = as_points(X)
        return (jnp.sum(X * X, axis=-1) + jnp.asarray(self.c, X.dtype)) ** self.degree


@pytree_dataclass
class ScaledKernel(Kernel):
    """variance * inner — KernelFunctions' `σ² * kernel`."""

    inner: Kernel
    variance: jax.Array = 1.0

    def gram(self, X, Z=None):
        v = jnp.asarray(self.variance)
        return v * self.inner.gram(X, Z)

    def diag(self, X):
        v = jnp.asarray(self.variance)
        return v * self.inner.diag(X)


@pytree_dataclass
class InputScaledKernel(Kernel):
    """inner(s*x, s*z) — KernelFunctions' `kernel ∘ ScaleTransform(s)`.

    ``scale`` may be scalar or (D,) for ARD.  ``with_lengthscale(k, l)`` is
    ``InputScaledKernel(k, 1/l)``.
    """

    inner: Kernel
    scale: jax.Array = 1.0

    def _tx(self, X):
        X = as_points(X)
        return X * jnp.asarray(self.scale, dtype=X.dtype)

    def gram(self, X, Z=None):
        Xt = self._tx(X)
        Zt = None if Z is None else self._tx(Z)
        return self.inner.gram(Xt, Zt)

    def diag(self, X):
        return self.inner.diag(self._tx(X))


def ScaleTransform(scale: jax.Array):
    """Returns a transform applicable via ``kernel ∘ ScaleTransform(s)`` in
    the reference; here use ``transform(kernel, scale)`` semantics through
    :class:`InputScaledKernel` — provided as a helper for API parity."""

    def apply(kernel: Kernel) -> Kernel:
        return InputScaledKernel(kernel, jnp.asarray(scale))

    return apply


def with_lengthscale(kernel: Kernel, lengthscale: jax.Array) -> Kernel:
    """KernelFunctions.with_lengthscale: k((x - z) / lengthscale)."""
    l = jnp.asarray(lengthscale)
    return InputScaledKernel(kernel, 1.0 / l)


def dk_from_k_for(k_of_r2_fn):
    """The g'(r²)-through-g(r²) shortcut for a static stationary map, or
    None.  Fused Pallas backwards use it to turn the kernel-map pullback
    into one elementwise multiply on an already-stored K tile (no r²
    rebuild, no transcendental recompute)."""
    return _DK_FROM_K.get(k_of_r2_fn)


_DK_FROM_K = {
    SqExponentialKernel.k_of_r2: SqExponentialKernel.dk_from_k,
}


def unwrap_stationary(kern: Kernel):
    """Decompose ``σ²·(base ∘ ScaleTransform(s))`` nests into
    ``(static k_of_r2, input_scale, variance)``, or None if the kernel is not
    a (possibly scaled) parameter-free stationary kernel.

    Lets fused Pallas kernels handle the standard scaled/lengthscaled
    kernels: the elementwise map stays a static function (warm jit cache)
    while lengthscale folds into the inputs and variance post-scales the
    output."""
    variance = None
    scale = None
    while True:
        if isinstance(kern, ScaledKernel):
            v = jnp.asarray(kern.variance)
            variance = v if variance is None else variance * v
            kern = kern.inner
        elif isinstance(kern, InputScaledKernel):
            s = jnp.asarray(kern.scale)
            scale = s if scale is None else scale * s
            kern = kern.inner
        else:
            break
    if not isinstance(kern, StationaryKernel):
        return None
    fn = kern._static_k_of_r2()
    if fn is None:
        return None
    return fn, scale, variance


def _unwrap_white(kern: Kernel):
    """``σ²·White`` nests → the traced σ² (or None).  Input scaling is
    absorbed: a positive rescaling preserves point (in)equality, so the
    white map is unchanged on distinct points."""
    variance = None
    while True:
        if isinstance(kern, ScaledKernel):
            v = jnp.asarray(kern.variance)
            variance = v if variance is None else variance * v
            kern = kern.inner
        elif isinstance(kern, InputScaledKernel):
            kern = kern.inner
        else:
            break
    if not isinstance(kern, WhiteKernel):
        return None
    return jnp.ones(()) if variance is None else variance


def unwrap_stationary_nugget(kern: Kernel):
    """:func:`unwrap_stationary` extended to a NUGGET term: decomposes
    ``σ²·(base ∘ ScaleTransform(s)) [+ τ²·White]`` — including outer-scaled
    sums like ``c·(k + w·White)``, whose factors distribute into both
    summands — into ``(static k_of_r2, input_scale, variance, nugget)``
    with ``nugget`` the traced τ² (None when there is no white term), or
    None if the kernel is not of that form.

    This is the standard noisy-data Vecchia training model (the precision
    root ignores FiniteGP observation noise, reference parity), and lets
    the fused band kernels keep the nugget on the Pallas tier: the white
    term becomes a (τ²/σ²)·I shift on the window Gram's INDEX diagonal —
    iid-observation-noise semantics, matching the XLA window gram's
    one-argument ``WhiteKernel.gram`` exactly.  For datasets with
    DUPLICATED sites the generic path's cross-covariance column
    (two-argument, value-equality white) would additionally couple
    coincident points, which the fused path never does (iid noise on two
    observations at the same site is independent); dedupe duplicated sites
    to keep the two tiers identical."""
    # peel outer σ²·(...) / input-scale wrappers: both distribute into a
    # sum (scaling inputs leaves the white term unchanged on distinct
    # points), so c·(k + w·White) dispatches the same as c·k + c·w·White
    out_var = None
    out_scale = None
    while True:
        if isinstance(kern, ScaledKernel):
            v = jnp.asarray(kern.variance)
            out_var = v if out_var is None else out_var * v
            kern = kern.inner
        elif isinstance(kern, InputScaledKernel):
            s = jnp.asarray(kern.scale)
            out_scale = s if out_scale is None else out_scale * s
            kern = kern.inner
        else:
            break

    def _mul(a, b):
        if a is None:
            return b
        return a if b is None else a * b

    if isinstance(kern, SumKernel):
        for a, b in ((kern.left, kern.right), (kern.right, kern.left)):
            white = _unwrap_white(b)
            if white is None:
                continue
            base = unwrap_stationary(a)
            if base is None:
                return None
            fn, scale, variance = base
            return (fn, _mul(out_scale, scale), _mul(out_var, variance),
                    _mul(out_var, white))
        return None
    base = unwrap_stationary(kern)
    if base is None:
        return None
    fn, scale, variance = base
    return fn, _mul(out_scale, scale), _mul(out_var, variance), None


@pytree_dataclass
class SumKernel(Kernel):
    left: Kernel
    right: Kernel

    def gram(self, X, Z=None):
        return self.left.gram(X, Z) + self.right.gram(X, Z)

    def diag(self, X):
        return self.left.diag(X) + self.right.diag(X)


@pytree_dataclass
class ProductKernel(Kernel):
    left: Kernel
    right: Kernel

    def gram(self, X, Z=None):
        return self.left.gram(X, Z) * self.right.gram(X, Z)

    def diag(self, X):
        return self.left.diag(X) * self.right.diag(X)
