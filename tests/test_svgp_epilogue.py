"""Fused Pallas SVGP data-term epilogue (ops/svgp_epilogue.py).

Interpret-mode (CPU f64) checks: forward and all four cotangents against the
naive dense form, padding/non-multiple shapes, symbolic-zero cotangents, and
end-to-end elbo/streaming equality when the fused path is forced.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import approximategps_tpu as agp
from approximategps_tpu.config import config_context
from approximategps_tpu.models.svgp_streaming import streaming_elbo
from approximategps_tpu.ops.svgp_epilogue import svgp_data_epilogue
from approximategps_tpu.utils.bijectors import softplus


def k_of_r2(r2):
    return jnp.exp(-0.5 * r2)


def naive(Xs, Zs, Se, ae):
    r2 = jnp.sum((Zs[:, None, :] - Xs[None, :, :]) ** 2, -1)
    K = k_of_r2(r2)
    return K.T @ ae, jnp.einsum("aj,ab,bj->j", K, Se, K)


def _inputs(M, B, D, seed=0):
    rng = np.random.default_rng(seed)
    Zs = jnp.asarray(rng.standard_normal((M, D)))
    Xs = jnp.asarray(rng.standard_normal((B, D)))
    S0 = rng.standard_normal((M, M))
    Se = jnp.asarray(0.5 * (S0 + S0.T))
    ae = jnp.asarray(rng.standard_normal((M,)))
    return Xs, Zs, Se, ae


@pytest.mark.parametrize(
    "M,B,D,bb,bm",
    [(16, 24, 3, 128, 8), (40, 100, 2, 128, 16), (48, 256, 5, 128, 16),
     (64, 130, 1, 128, 32)],
)
def test_forward_matches_naive(M, B, D, bb, bm):
    Xs, Zs, Se, ae = _inputs(M, B, D)
    mu1, var1 = svgp_data_epilogue(Xs, Zs, Se, ae, k_of_r2, bb, bm)
    mu2, var2 = naive(Xs, Zs, Se, ae)
    np.testing.assert_allclose(mu1, mu2, rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(var1, var2, rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("M,B,D", [(16, 24, 3), (40, 100, 2)])
def test_backward_matches_naive(M, B, D):
    Xs, Zs, Se, ae = _inputs(M, B, D)
    rng = np.random.default_rng(1)
    wv = jnp.asarray(rng.standard_normal((B,)))
    wm = jnp.asarray(rng.standard_normal((B,)))

    def lf(fn):
        def loss(*a):
            mu, var = fn(*a)
            return jnp.sum(mu * wm) + jnp.sum(jnp.sin(var) * wv)

        return loss

    g1 = jax.grad(
        lf(lambda *a: svgp_data_epilogue(*a, k_of_r2, 128, 16)),
        argnums=(0, 1, 2, 3),
    )(Xs, Zs, Se, ae)
    g2 = jax.grad(lf(naive), argnums=(0, 1, 2, 3))(Xs, Zs, Se, ae)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(a, b, rtol=1e-10, atol=1e-10)


def test_symbolic_zero_cotangents():
    """Only-mu and only-var losses differentiate cleanly."""
    Xs, Zs, Se, ae = _inputs(24, 40, 2)

    def mu_only(Xs, Zs, Se, ae):
        return jnp.sum(svgp_data_epilogue(Xs, Zs, Se, ae, k_of_r2, 128, 8)[0])

    def var_only(Xs, Zs, Se, ae):
        return jnp.sum(svgp_data_epilogue(Xs, Zs, Se, ae, k_of_r2, 128, 8)[1])

    def mu_only_naive(Xs, Zs, Se, ae):
        return jnp.sum(naive(Xs, Zs, Se, ae)[0])

    def var_only_naive(Xs, Zs, Se, ae):
        return jnp.sum(naive(Xs, Zs, Se, ae)[1])

    for f, g in [(mu_only, mu_only_naive), (var_only, var_only_naive)]:
        ga = jax.jit(jax.grad(f, argnums=(0, 1, 2, 3)))(Xs, Zs, Se, ae)
        gb = jax.jit(jax.grad(g, argnums=(0, 1, 2, 3)))(Xs, Zs, Se, ae)
        for a, b in zip(ga, gb):
            np.testing.assert_allclose(a, b, rtol=1e-10, atol=1e-12)


def _svgp_setup(key, M=24, B=64, D=2):
    kx, kz, kA = jax.random.split(key, 3)
    x = jax.random.normal(kx, (B, D))
    y = jnp.sin(x[:, 0])
    z = jax.random.normal(kz, (M, D))
    kernel = 1.7 * agp.with_lengthscale(agp.SqExponentialKernel(), 0.8)
    f = agp.GP(kernel)
    A = jnp.eye(M) + 0.05 * jax.random.normal(kA, (M, M))
    q = agp.MultivariateNormal(0.1 * jnp.ones(M), jnp.tril(A))
    sva = agp.SparseVariationalApproximation(f(z, 1e-6), q)
    return sva, f, x, y


def test_elbo_fused_equals_xla(key):
    """elbo with data_term_mode=pallas (interpret) == xla path, f64."""
    sva, f, x, y = _svgp_setup(key)
    with config_context(solve_mode="inv_matmul", data_term_mode="xla"):
        e_xla = agp.elbo(sva, f(x, 0.1), y, num_data=500)
    with config_context(
        solve_mode="inv_matmul", data_term_mode="pallas", pallas_interpret=True
    ):
        e_pal = agp.elbo(sva, f(x, 0.1), y, num_data=500)
    np.testing.assert_allclose(e_pal, e_xla, rtol=1e-11)


def test_elbo_fused_gradients_equal_xla(key):
    sva, f, x, y = _svgp_setup(key)

    def loss(params, mode):
        kernel = softplus(params["k"][0]) * agp.with_lengthscale(
            agp.SqExponentialKernel(), softplus(params["k"][1])
        )
        fp = agp.GP(kernel)
        q = agp.MultivariateNormal(params["m"], jnp.tril(params["A"]))
        sva_p = agp.SparseVariationalApproximation(fp(params["z"], 1e-6), q)
        with config_context(
            solve_mode="inv_matmul",
            data_term_mode=mode,
            pallas_interpret=(mode == "pallas"),
        ):
            return -agp.elbo(sva_p, fp(x, 0.1), y, num_data=500)

    M = sva.q.mean.shape[0]
    params = {
        "k": jnp.array([0.3, 0.6]),
        "z": sva.fz.x,
        "m": sva.q.mean,
        "A": sva.q.scale_tril,
    }
    g_xla = jax.jit(jax.grad(loss), static_argnums=1)(params, "xla")
    g_pal = jax.jit(jax.grad(loss), static_argnums=1)(params, "pallas")
    for k in g_xla:
        # tolerance: different tiling/summation order than the XLA path
        # (observed ~1e-7 abs on O(1e3) gradients in f64)
        np.testing.assert_allclose(
            g_pal[k], g_xla[k], rtol=1e-6, atol=1e-5,
            err_msg=f"grad mismatch for {k}",
        )


def test_streaming_fused_equals_xla(key):
    sva, f, x, y = _svgp_setup(key, B=100)
    lik = agp.GaussianLikelihood(jnp.asarray(0.1))
    with config_context(solve_mode="inv_matmul", data_term_mode="xla"):
        e_xla = streaming_elbo(sva, lik, x, y, block_size=32, num_data=500)
    with config_context(
        solve_mode="inv_matmul", data_term_mode="pallas", pallas_interpret=True
    ):
        e_pal = streaming_elbo(sva, lik, x, y, block_size=32, num_data=500)
    np.testing.assert_allclose(e_pal, e_xla, rtol=1e-11)


def test_non_stationary_kernel_falls_back(key):
    """A kernel that unwrap_stationary rejects silently uses the XLA path."""
    kx, kz = jax.random.split(key)
    x = jax.random.normal(kx, (32, 2))
    y = jnp.sin(x[:, 0])
    z = jax.random.normal(kz, (8, 2))
    kernel = agp.SqExponentialKernel() + agp.Matern32Kernel()  # SumKernel
    f = agp.GP(kernel)
    q = agp.MultivariateNormal(jnp.zeros(8), jnp.eye(8))
    sva = agp.SparseVariationalApproximation(f(z, 1e-6), q)
    with config_context(
        solve_mode="inv_matmul", data_term_mode="pallas", pallas_interpret=True
    ):
        e1 = agp.elbo(sva, f(x, 0.1), y)
    with config_context(solve_mode="inv_matmul", data_term_mode="xla"):
        e2 = agp.elbo(sva, f(x, 0.1), y)
    np.testing.assert_allclose(e1, e2, rtol=1e-12)


def test_epilogue_vmem_gate(monkeypatch):
    """The fused epilogue declines statically when its VMEM working set
    cannot fit (M=8192 measured at ~29 MB vs the 16 MB Mosaic scoped
    limit): auto mode falls back to XLA, forced 'pallas' raises a clear
    error instead of a Mosaic compile failure."""
    from approximategps_tpu.config import config_context
    from approximategps_tpu.models.svgp import _epilogue_ready
    from approximategps_tpu.ops import svgp_epilogue as ep

    monkeypatch.setattr(ep, "_interpret", lambda: False)  # hardware rules
    with config_context(matmul_precision="default"):  # TPU production: bf16 store
        assert ep.epilogue_supported(2048, 8192, jnp.float32)
        assert not ep.epilogue_supported(4096, 8192, jnp.float32)
        assert not ep.epilogue_supported(8192, 8192, jnp.float32)

    prior = agp.GP(agp.SqExponentialKernel())
    big = jax.ShapeDtypeStruct((8192, 8192), jnp.float32)  # stands in for S_corr
    with config_context(data_term_mode="pallas"):
        with pytest.raises(ValueError, match="VMEM"):
            _epilogue_ready(prior, big)
    with config_context(data_term_mode="auto"):
        assert _epilogue_ready(prior, big, prefer=True) is None
