"""Fused Pallas gram-matvec tier (``ops/gram_matvec.py``).

``pallas_gram_matvec`` computes ``K(Xq, Zk) @ v`` for stationary kernels
without materializing K (interpret mode on CPU; the real kernel runs on
TPU).  Beyond-reference: this is the matvec layer under the matrix-free
tier (SURVEY.md §2.2 — the reference's scope is dense-only).

Covers: forward vs the dense oracle across the static stationary maps and
awkward (padding-exercising) shapes, the fused custom VJP vs finite
differences and vs the XLA path's gradients (incl. kernel hyperparameters
through the ``unwrap_stationary`` dispatch), the ``kernel_matvec``
integration (scalar/vector noise, multi-RHS and vmap fallthrough), and the
dispatch negative cases.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.test_util import check_grads

import approximategps_tpu as agp
from approximategps_tpu.config import config_context
from approximategps_tpu.core.kernels import (
    LinearKernel,
    Matern12Kernel,
    Matern32Kernel,
    Matern52Kernel,
    SqExponentialKernel,
)
from approximategps_tpu.models.iterative import kernel_matvec
from approximategps_tpu.ops.gram_matvec import (
    fused_stationary_matvec,
    pallas_gram_matvec,
)

KEY = jax.random.PRNGKey(20260820)

FUSED = dict(matvec_mode="fused", use_pallas=True, pallas_interpret=True)


def _dense_oracle(Xq, Zk, v, fn):
    r2 = jnp.sum((Xq[:, None, :] - Zk[None, :, :]) ** 2, axis=-1)
    return fn(r2) @ v


@pytest.mark.parametrize(
    "kcls",
    [SqExponentialKernel, Matern12Kernel, Matern32Kernel, Matern52Kernel],
)
@pytest.mark.parametrize("shape", [(73, 57, 2), (9, 300, 1), (130, 8, 3)])
def test_fused_forward_matches_dense(kcls, shape):
    N, M, D = shape
    k1, k2, k3 = jax.random.split(jax.random.fold_in(KEY, N + M), 3)
    Xq = jax.random.uniform(k1, (N, D)) * 3
    Zk = jax.random.uniform(k2, (M, D)) * 3
    v = jax.random.normal(k3, (M,))
    fn = kcls.k_of_r2
    with config_context(**FUSED):
        got = pallas_gram_matvec(Xq, Zk, v, fn)
    want = _dense_oracle(Xq, Zk, v, fn)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-12, atol=1e-12)


def test_fused_multi_rhs_matches_dense():
    k1, k2, k3 = jax.random.split(KEY, 3)
    Xq = jax.random.uniform(k1, (41, 2)) * 3
    Zk = jax.random.uniform(k2, (29, 2)) * 3
    V = jax.random.normal(k3, (29, 5))
    fn = SqExponentialKernel.k_of_r2
    with config_context(**FUSED):
        from approximategps_tpu.ops.gram_matvec import _forward_multi

        got = _forward_multi(Xq, Zk, V, fn, 512, 2048)
    want = _dense_oracle(Xq, Zk, V, fn)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("kcls", [SqExponentialKernel, Matern32Kernel])
def test_fused_vjp_matches_fd(kcls):
    k1, k2, k3 = jax.random.split(jax.random.fold_in(KEY, 7), 3)
    # Spread-out points: Matérn maps are |r|-kinked at coincidence, keep FD
    # perturbations away from r = 0 (the analytic zero-safe grad is checked
    # against the XLA path in the hyperparameter test below).
    Xq = jax.random.uniform(k1, (13, 2)) * 4
    Zk = 5.0 + jax.random.uniform(k2, (11, 2)) * 4
    v = jax.random.normal(k3, (11,))
    fn = kcls.k_of_r2
    with config_context(**FUSED):
        check_grads(
            lambda a, b, c: jnp.sum(jnp.cos(pallas_gram_matvec(a, b, c, fn))),
            (Xq, Zk, v), order=1, modes=["rev"], atol=1e-6, rtol=1e-6,
        )


def test_fused_vjp_matches_xla_at_coincident_points():
    """Self-gram (Xq is Zk, r=0 on the diagonal): the fused backward's
    jvp-of-the-map must stay finite and equal the dense path's gradient."""
    k1, k2 = jax.random.split(KEY)
    X = jax.random.uniform(k1, (17, 2)) * 3
    v = jax.random.normal(k2, (17,))
    for fn in (SqExponentialKernel.k_of_r2, Matern52Kernel.k_of_r2):
        with config_context(**FUSED):
            gX, gv = jax.grad(
                lambda a, c: jnp.sum(jnp.sin(pallas_gram_matvec(a, a, c, fn))),
                argnums=(0, 1),
            )(X, v)
        gX_d, gv_d = jax.grad(
            lambda a, c: jnp.sum(jnp.sin(_dense_oracle(a, a, c, fn))),
            argnums=(0, 1),
        )(X, v)
        assert np.all(np.isfinite(np.asarray(gX)))
        np.testing.assert_allclose(np.asarray(gX), np.asarray(gX_d),
                                   rtol=1e-9, atol=1e-11)
        np.testing.assert_allclose(np.asarray(gv), np.asarray(gv_d),
                                   rtol=1e-9, atol=1e-11)


def _make_kern(log_ls, log_var):
    return jnp.exp(log_var) * agp.with_lengthscale(
        SqExponentialKernel(), jnp.exp(log_ls)
    )


@pytest.mark.parametrize("noise", [0.3, "vector"])
def test_kernel_matvec_fused_matches_xla(noise):
    k1, k2, k3 = jax.random.split(jax.random.fold_in(KEY, 11), 3)
    N = 67
    x = jax.random.uniform(k1, (N, 2)) * 3
    v = jax.random.normal(k2, (N,))
    nz = 0.1 + jax.random.uniform(k3, (N,)) if noise == "vector" else noise
    kern = _make_kern(jnp.asarray(0.2), jnp.asarray(0.4))
    with config_context(matvec_mode="xla"):
        want = kernel_matvec(kern, x, nz, block_size=32)(v)
    with config_context(**FUSED):
        mv = kernel_matvec(kern, x, nz, block_size=32)
        got = mv(v)
        got_nb = kernel_matvec(kern, x, nz)(v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-11, atol=1e-11)
    np.testing.assert_allclose(np.asarray(got_nb), np.asarray(want),
                               rtol=1e-11, atol=1e-11)


def test_kernel_matvec_fused_hyperparameter_grads():
    """Lengthscale/variance cotangents flow through the fused dispatch's
    input-scale fold (Xs = X·s) and output scale — match the XLA path."""
    k1, k2 = jax.random.split(jax.random.fold_in(KEY, 13))
    x = jax.random.uniform(k1, (41, 2)) * 3
    v = jax.random.normal(k2, (41,))

    def loss(params, mode):
        with config_context(matvec_mode=mode, use_pallas=True,
                            pallas_interpret=True):
            kern = _make_kern(*params)
            return jnp.sum(jnp.tanh(kernel_matvec(kern, x, 0.2)(v)))

    params = (jnp.asarray(-0.3), jnp.asarray(0.5))
    g_fused = jax.grad(loss)(params, "fused")
    g_xla = jax.grad(loss)(params, "xla")
    for a, b in zip(g_fused, g_xla):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-9, atol=1e-11)


def test_kernel_matvec_fused_multirhs_and_vmap_fallthrough():
    """Narrow multi-RHS (R ≤ config.matvec_fused_max_rhs) rides the fused
    kernel; wide blocks and vmapped 1-D v fall through to the XLA block
    path.  All three must agree with the XLA oracle."""
    k1, k2 = jax.random.split(jax.random.fold_in(KEY, 17))
    x = jax.random.uniform(k1, (37, 2)) * 3
    V = jax.random.normal(k2, (37, 4))
    kern = _make_kern(jnp.asarray(0.1), jnp.asarray(0.0))
    with config_context(matvec_mode="xla"):
        want = kernel_matvec(kern, x, 0.5, block_size=16)(V)
    with config_context(**FUSED):
        mv = kernel_matvec(kern, x, 0.5, block_size=16)
        got2d = mv(V)  # R=4 ≤ cap → fused
        got_vm = jax.vmap(mv, in_axes=1, out_axes=1)(V)  # vmap → XLA
    with config_context(**FUSED, matvec_fused_max_rhs=2):
        got_wide = kernel_matvec(kern, x, 0.5, block_size=16)(V)  # R>cap → XLA
    np.testing.assert_allclose(np.asarray(got2d), np.asarray(want),
                               rtol=1e-11, atol=1e-11)
    np.testing.assert_allclose(np.asarray(got_vm), np.asarray(want),
                               rtol=1e-11, atol=1e-11)
    np.testing.assert_allclose(np.asarray(got_wide), np.asarray(want),
                               rtol=1e-11, atol=1e-11)


@pytest.mark.parametrize("kcls", [SqExponentialKernel, Matern32Kernel])
def test_fused_multirhs_vjp_matches_dense(kcls):
    """The rank-R generalized backward (``_coord_cotangent``) vs the dense
    oracle's gradients, including the chunked path (R·(1+D) > 128 forces
    more than one fused g' pass per cotangent)."""
    k1, k2, k3 = jax.random.split(jax.random.fold_in(KEY, 23), 3)
    Xq = jax.random.uniform(k1, (19, 2)) * 3
    Zk = jax.random.uniform(k2, (13, 2)) * 3
    fn = kcls.k_of_r2
    for R in (5, 50):  # 50·3 = 150 > 128 → chunked cotangent passes
        V = jax.random.normal(jax.random.fold_in(k3, R), (13, R))

        def loss_fused(a, b, c):
            with config_context(**FUSED):
                return jnp.sum(jnp.cos(pallas_gram_matvec(a, b, c, fn)))

        def loss_dense(a, b, c):
            return jnp.sum(jnp.cos(_dense_oracle(a, b, c, fn)))

        got = jax.grad(loss_fused, argnums=(0, 1, 2))(Xq, Zk, V)
        want = jax.grad(loss_dense, argnums=(0, 1, 2))(Xq, Zk, V)
        for g, w in zip(got, want):
            np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                       rtol=1e-9, atol=1e-11)


def test_fused_multirhs_self_gram_vjp_finite():
    """Multi-RHS self-gram (coincident points on the diagonal): the fused
    backward must stay finite and match the dense path."""
    k1, k2 = jax.random.split(jax.random.fold_in(KEY, 29))
    X = jax.random.uniform(k1, (17, 2)) * 3
    V = jax.random.normal(k2, (17, 6))
    fn = Matern52Kernel.k_of_r2
    with config_context(**FUSED):
        gX, gV = jax.grad(
            lambda a, c: jnp.sum(jnp.sin(pallas_gram_matvec(a, a, c, fn))),
            argnums=(0, 1),
        )(X, V)
    gX_d, gV_d = jax.grad(
        lambda a, c: jnp.sum(jnp.sin(_dense_oracle(a, a, c, fn))),
        argnums=(0, 1),
    )(X, V)
    assert np.all(np.isfinite(np.asarray(gX)))
    np.testing.assert_allclose(np.asarray(gX), np.asarray(gX_d),
                               rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(np.asarray(gV), np.asarray(gV_d),
                               rtol=1e-9, atol=1e-11)


def test_fused_dispatch_negative_cases():
    x2 = jnp.ones((5, 2))
    with config_context(**FUSED):
        # non-stationary kernel → no fused closure
        assert fused_stationary_matvec(LinearKernel(), x2) is None
        # D > 8 → no fused closure
        assert fused_stationary_matvec(
            SqExponentialKernel(), jnp.ones((5, 9))
        ) is None
    with config_context(matvec_mode="xla"):
        assert fused_stationary_matvec(SqExponentialKernel(), x2) is None
    with config_context(matvec_mode="auto", use_pallas=True):
        # auto off-TPU declines (interpret-mode Pallas is test-only)
        if jax.default_backend() != "tpu":
            assert fused_stationary_matvec(SqExponentialKernel(), x2) is None
