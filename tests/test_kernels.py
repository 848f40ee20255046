"""Kernel library tests: gram correctness vs naive evaluation, mode
equivalence (broadcast/mxu/pallas-interpret), combinators, gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import approximategps_tpu as agp
from approximategps_tpu.config import config_context
from approximategps_tpu.core.kernels import pairwise_sq_dist

KERNELS = [
    agp.SqExponentialKernel(),
    agp.Matern12Kernel(),
    agp.Matern32Kernel(),
    agp.Matern52Kernel(),
    agp.RationalQuadraticKernel(alpha=1.7),
    agp.PeriodicKernel(period=2.3),
]


def _naive_gram(kern, X, Z):
    X = np.atleast_2d(np.asarray(X).T).T if np.asarray(X).ndim == 1 else np.asarray(X)
    Z = np.atleast_2d(np.asarray(Z).T).T if np.asarray(Z).ndim == 1 else np.asarray(Z)
    out = np.zeros((X.shape[0], Z.shape[0]))
    for i in range(X.shape[0]):
        for j in range(Z.shape[0]):
            out[i, j] = float(kern(jnp.asarray(X[i]), jnp.asarray(Z[j])))
    return out


@pytest.mark.parametrize("kern", KERNELS, ids=lambda k: type(k).__name__)
def test_gram_matches_pointwise(kern, key):
    k1, k2 = jax.random.split(key)
    X = jax.random.normal(k1, (7, 2))
    Z = jax.random.normal(k2, (5, 2))
    K = kern.gram(X, Z)
    np.testing.assert_allclose(K, _naive_gram(kern, X, Z), atol=1e-12)
    # diag consistency
    np.testing.assert_allclose(kern.diag(X), jnp.diagonal(kern.gram(X)), atol=1e-12)


@pytest.mark.parametrize("kern", KERNELS, ids=lambda k: type(k).__name__)
def test_gram_modes_agree(kern, key):
    k1, k2 = jax.random.split(key)
    X = jax.random.normal(k1, (9, 3))
    Z = jax.random.normal(k2, (6, 3))
    with config_context(gram_mode="broadcast"):
        Kb = kern.gram(X, Z)
    with config_context(gram_mode="mxu"):
        Km = kern.gram(X, Z)
    np.testing.assert_allclose(Kb, Km, atol=1e-10)


def test_pairwise_sq_dist_modes(key):
    X = jax.random.normal(key, (8, 4))
    d_b = pairwise_sq_dist(X, X, mode="broadcast")
    d_m = pairwise_sq_dist(X, X, mode="mxu")
    np.testing.assert_allclose(d_b, d_m, atol=1e-10)
    assert (np.asarray(d_m) >= 0).all()


def test_1d_inputs_treated_as_single_feature(key):
    x = jnp.linspace(0, 1, 5)
    kern = agp.SqExponentialKernel()
    K1 = kern.gram(x)
    K2 = kern.gram(x[:, None])
    np.testing.assert_allclose(K1, K2)


def test_lengthscale_and_variance(key):
    x = jax.random.normal(key, (6,))
    base = agp.SqExponentialKernel()
    l, v = 0.7, 2.5
    kern = v * agp.with_lengthscale(base, l)
    expected = v * np.asarray(base.gram(x / l))
    np.testing.assert_allclose(kern.gram(x), expected, atol=1e-12)
    np.testing.assert_allclose(kern.diag(x), np.full(6, v), atol=1e-12)


def test_ard_lengthscale(key):
    X = jax.random.normal(key, (6, 3))
    ls = jnp.array([0.5, 1.0, 2.0])
    kern = agp.with_lengthscale(agp.SqExponentialKernel(), ls)
    expected = agp.SqExponentialKernel().gram(X / ls)
    np.testing.assert_allclose(kern.gram(X), expected, atol=1e-12)


def test_sum_product_combinators(key):
    x = jax.random.normal(key, (5,))
    k1, k2 = agp.SqExponentialKernel(), agp.Matern32Kernel()
    np.testing.assert_allclose(
        (k1 + k2).gram(x), np.asarray(k1.gram(x)) + np.asarray(k2.gram(x))
    )
    np.testing.assert_allclose(
        (k1 * k2).gram(x), np.asarray(k1.gram(x)) * np.asarray(k2.gram(x))
    )


def test_white_and_constant(key):
    x = jax.random.normal(key, (4,))
    np.testing.assert_allclose(agp.WhiteKernel().gram(x), np.eye(4))
    np.testing.assert_allclose(agp.ConstantKernel(3.0).gram(x), np.full((4, 4), 3.0))


def test_kernel_is_pytree_and_differentiable(key):
    x = jax.random.normal(key, (6,))

    def loss(v, l):
        kern = v * agp.with_lengthscale(agp.SqExponentialKernel(), l)
        return jnp.sum(kern.gram(x))

    g = jax.grad(loss, argnums=(0, 1))(1.2, 0.8)
    assert all(np.isfinite(gi) and gi != 0 for gi in g)


def test_matern_gradient_no_nan_at_zero_distance():
    # duplicate points: r2 == 0 off-diagonal must not poison lengthscale grads
    x = jnp.array([0.3, 0.3, 1.0])

    def loss(l):
        kern = agp.with_lengthscale(agp.Matern32Kernel(), l)
        return jnp.sum(kern.gram(x))

    g = jax.grad(loss)(0.9)
    assert np.isfinite(g)


def test_white_kernel_cross_gram_matches_delta_semantics():
    """Two-argument WhiteKernel gram compares point values (KernelFunctions
    delta semantics): shared points between X and Z produce 1."""
    x = jnp.array([[0.0], [1.0], [2.0]])
    z = jnp.array([[1.0], [3.0]])
    K = agp.WhiteKernel().gram(x, z)
    np.testing.assert_allclose(K, np.array([[0.0, 0.0], [1.0, 0.0], [0.0, 0.0]]))
    np.testing.assert_allclose(agp.WhiteKernel().gram(x, x), np.eye(3))
