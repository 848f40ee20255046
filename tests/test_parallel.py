"""Multi-device data-parallel tests on the 8-virtual-device CPU mesh
(SURVEY.md §2.4: DP over data points, params replicated, psum reductions)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

import approximategps_tpu as agp
from approximategps_tpu.parallel import (
    data_mesh,
    make_dp_elbo,
    make_dp_train_step,
    replicated,
    shard_batch,
)
from approximategps_tpu.utils.bijectors import softplus


def _model(params, x, noise=0.1, jitter=1e-6):
    kernel = softplus(params["k"][0]) * agp.with_lengthscale(
        agp.SqExponentialKernel(), softplus(params["k"][1])
    )
    f = agp.GP(kernel)
    fx = f(x, noise)
    fz = f(params["z"], jitter)
    M = params["m"].shape[0]
    q = agp.MultivariateNormal(params["m"], jnp.tril(params["A"]))
    return agp.SparseVariationalApproximation(fz, q), fx


def _params(M=8):
    z = jnp.linspace(0, 10, M)
    return {
        "k": jnp.array([0.5, 0.5]),
        "z": z,
        "m": jnp.zeros(M),
        "A": jnp.eye(M),
    }


def _data(N=64):
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (N,)) * 10
    y = jnp.sin(x) + 0.1 * jax.random.normal(jax.random.PRNGKey(1), (N,))
    return x, y


def test_eight_devices_available():
    assert jax.device_count() >= 8


def test_dp_elbo_matches_single_device():
    mesh = data_mesh()
    params = _params()
    x, y = _data()
    N = len(y)

    def elbo_fn(params, xb, yb):
        sva, _ = _model(params, xb)
        fxb = sva.fz.f(xb, 0.1)
        return agp.elbo(sva, fxb, yb, num_data=N)

    single = elbo_fn(params, x, y)
    dp = make_dp_elbo(elbo_fn, mesh)(params, x, y)
    np.testing.assert_allclose(float(dp), float(single), rtol=1e-10)


def test_dp_gradients_match_single_device():
    mesh = data_mesh()
    params = _params()
    x, y = _data()
    N = len(y)

    def loss(params, xb, yb):
        sva, _ = _model(params, xb)
        fxb = sva.fz.f(xb, 0.1)
        return -agp.elbo(sva, fxb, yb, num_data=N)

    g_single = jax.jit(jax.grad(loss))(params, x, y)

    batch_sh = shard_batch(mesh)
    rep = replicated(mesh)
    g_dp = jax.jit(
        jax.grad(loss), in_shardings=(rep, batch_sh, batch_sh), out_shardings=rep
    )(params, jax.device_put(x, batch_sh), jax.device_put(y, batch_sh))
    for ks in g_single:
        np.testing.assert_allclose(g_dp[ks], g_single[ks], rtol=1e-8, atol=1e-10)


def test_dp_train_step_runs_and_improves():
    mesh = data_mesh()
    params = _params()
    x, y = _data()
    N = len(y)

    def loss(params, xb, yb):
        sva, _ = _model(params, xb)
        fxb = sva.fz.f(xb, 0.1)
        return -agp.elbo(sva, fxb, yb, num_data=N)

    opt = optax.adam(1e-2)
    step = make_dp_train_step(loss, opt, mesh)
    opt_state = opt.init(params)
    losses = []
    for _ in range(20):
        params, opt_state, l = step(params, opt_state, x, y)
        losses.append(float(l))
    assert losses[-1] < losses[0]
    # result arrays remain replicated (usable on host)
    assert np.all(np.isfinite(np.asarray(params["m"])))


def test_vecchia_construction_shards_over_points():
    """The batched k×k Cholesky construction is embarrassingly parallel over
    N: sharding the index axis must not change the result."""
    from approximategps_tpu.models.vecchia import approx_root_prec_band

    x = jnp.linspace(0, 20, 64)
    kern = agp.Matern32Kernel()
    U_ref = jax.jit(lambda x: approx_root_prec_band(x, 4, kern))(x)

    mesh = data_mesh()
    fn = jax.jit(
        lambda xs: approx_root_prec_band(xs, 4, kern),
        out_shardings=shard_batch(mesh),
    )
    U_dp = fn(x)
    np.testing.assert_allclose(U_dp, U_ref, atol=1e-12)


def test_dp_streaming_elbo_matches_dense():
    """shard_map streaming ELBO (v5e-16 stretch path) == dense single-device
    elbo, values and gradients."""
    from approximategps_tpu.models.svgp_streaming import dp_streaming_elbo

    mesh = data_mesh()
    params = _params()
    x, y = _data(N=64)
    N = len(y)
    lik = agp.GaussianLikelihood(0.1)

    def dense(params):
        sva, _ = _model(params, x)
        fx = sva.fz.f(x, 0.1)
        return agp.elbo(sva, fx, y, num_data=N)

    def dp(params):
        sva, _ = _model(params, x)
        return dp_streaming_elbo(
            sva, lik, x, y, mesh, block_size=4, num_data=N
        )

    v1, g1 = jax.value_and_grad(dense)(params)
    v2, g2 = jax.jit(jax.value_and_grad(dp))(params)
    np.testing.assert_allclose(float(v2), float(v1), rtol=1e-9)
    for k in g1:
        np.testing.assert_allclose(g2[k], g1[k], rtol=1e-7, atol=1e-10)


def test_dp_streaming_elbo_uneven_n():
    """dp_streaming_elbo pads + masks when N is not a multiple of the mesh
    size or the block size (VERDICT r1 item 6): values and gradients match
    the dense single-device ELBO at N=61 on 8 devices."""
    from approximategps_tpu.models.svgp_streaming import dp_streaming_elbo

    mesh = data_mesh()
    params = _params()
    x, y = _data(N=61)  # 61 = 8*7 + 5: uneven across devices AND blocks
    N = len(y)
    lik = agp.GaussianLikelihood(0.1)

    def dense(params):
        sva, _ = _model(params, x)
        fx = sva.fz.f(x, 0.1)
        return agp.elbo(sva, fx, y, num_data=N)

    def dp(params):
        sva, _ = _model(params, x)
        return dp_streaming_elbo(sva, lik, x, y, mesh, block_size=3, num_data=N)

    v1, g1 = jax.value_and_grad(dense)(params)
    v2, g2 = jax.jit(jax.value_and_grad(dp))(params)
    np.testing.assert_allclose(float(v2), float(v1), rtol=1e-9)
    for k in g1:
        np.testing.assert_allclose(g2[k], g1[k], rtol=1e-7, atol=1e-10)


def test_stretch_pipeline_whitened_natgrad_dp():
    """The v5e-16 stretch recipe end-to-end on the virtual mesh (BASELINE.md
    stretch row: "data-parallel ELBO via psum, whitened + natural-gradient
    updates"): a WHITENED (NonCentered) SVGP, dp_streaming_elbo over 8
    devices with uneven N, variational (m, S) updated by ONE natural-gradient
    step with lr=1 — which for a conjugate Gaussian likelihood lands exactly
    on the optimal q, so the DP ELBO afterwards equals the collapsed Titsias
    bound (vfe_elbo)."""
    from approximategps_tpu.models.svgp_streaming import dp_streaming_elbo
    from approximategps_tpu.models.vfe import VFE, vfe_elbo
    from approximategps_tpu.utils.training import natgrad_update

    mesh = data_mesh()
    x, y = _data(N=61)
    N = len(y)
    M = 8
    z = jnp.linspace(0, 10, M)
    noise = 0.1
    lik = agp.GaussianLikelihood(noise)
    kernel = 1.3 * agp.with_lengthscale(agp.SqExponentialKernel(), 0.9)
    f = agp.GP(kernel)
    fz = f(z, 1e-8)

    def dp_elbo_mS(m, S):
        L = jnp.linalg.cholesky(S)
        q = agp.MultivariateNormal(m, L)
        sva = agp.SparseVariationalApproximation(fz, q)  # NonCentered
        return dp_streaming_elbo(sva, lik, x, y, mesh, block_size=16,
                                 num_data=N)

    m0 = 0.3 * jnp.ones(M)
    S0 = 2.0 * jnp.eye(M)
    e0, (gm, gS) = jax.jit(
        jax.value_and_grad(dp_elbo_mS, argnums=(0, 1))
    )(m0, S0)
    m1, L1 = natgrad_update(m0, jnp.linalg.cholesky(S0), gm, gS, lr=1.0)
    e1 = jax.jit(dp_elbo_mS)(m1, L1 @ L1.T)
    assert float(e1) > float(e0)
    # one conjugate natgrad step is exactly optimal → ELBO == collapsed bound
    bound = vfe_elbo(VFE(fz), f(x, noise), y)
    np.testing.assert_allclose(float(e1), float(bound), rtol=1e-8)


def test_dp_predict_blocks_matches_single_device():
    """Scale-out serving: the mesh-sharded prediction sweep must agree with
    the single-device posterior at every test point, including with a test
    count that divides neither the mesh nor the block size (pad rows
    computed-and-discarded on both axes)."""
    from approximategps_tpu.parallel import dp_predict_blocks

    mesh = data_mesh()
    params = _params()
    x, y = _data()
    sva, fx = _model(params, x)
    f_post = agp.posterior(sva)

    xs = jnp.linspace(-1.0, 11.0, 203)  # 203 = not a multiple of 8 or 32
    mu_ref, var_ref = f_post.mean_and_var(xs)
    mu, var = dp_predict_blocks(f_post, xs, mesh, block_size=32)
    assert mu.shape == (203,) and var.shape == (203,)
    np.testing.assert_allclose(np.asarray(mu), np.asarray(mu_ref), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(var), np.asarray(var_ref), rtol=1e-10)


def test_matrixfree_mesh_matvec_value_and_grad_parity():
    """VERDICT r4 item 3: the matrix-free tier's multi-device leg — mesh-
    sharded kernel_matvec drives logpdf_slq (value AND hyperparameter
    gradient), posterior_cg, and the LaplaceCG Newton solve to parity with
    the single-device path on the 8-virtual-device CPU mesh."""
    from approximategps_tpu.models.iterative import (
        kernel_matvec,
        logpdf_slq,
        posterior_cg,
    )
    from approximategps_tpu.models.laplace_cg import newton_inner_loop_cg

    mesh = data_mesh()
    key = jax.random.PRNGKey(3)
    N = 200  # deliberately NOT divisible by 8: exercises the row padding
    x = jnp.sort(jax.random.uniform(key, (N,)) * 8)
    kern = 1.3 * agp.with_lengthscale(agp.Matern52Kernel(), 0.9)
    f = agp.GP(kern)
    fx = f(x, 0.1)
    y = fx.sample(jax.random.fold_in(key, 1))

    # 1. raw matvec parity (incl. multi-RHS and block chunking)
    V = jax.random.normal(jax.random.fold_in(key, 2), (N, 3))
    mv0 = kernel_matvec(kern, x, 0.1)
    mv1 = kernel_matvec(kern, x, 0.1, block_size=16, mesh=mesh)
    np.testing.assert_allclose(
        np.asarray(mv1(V)), np.asarray(mv0(V)), rtol=1e-12, atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(mv1(V[:, 0])), np.asarray(mv0(V[:, 0])),
        rtol=1e-12, atol=1e-12,
    )

    # 2. logpdf_slq value + hyperparameter gradient parity (same probes)
    def lml(theta, mesh_):
        k_ = jax.nn.softplus(theta[0]) * agp.with_lengthscale(
            agp.Matern52Kernel(), jax.nn.softplus(theta[1])
        )
        return logpdf_slq(
            agp.GP(k_)(x, 0.1), y, jax.random.PRNGKey(7),
            num_probes=8, lanczos_iters=30, cg_tol=1e-10, mesh=mesh_,
        )

    theta = jnp.array([1.0, 0.8])
    v0, g0 = jax.value_and_grad(lml)(theta, None)
    v1, g1 = jax.value_and_grad(lml)(theta, mesh)
    np.testing.assert_allclose(float(v1), float(v0), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0), rtol=1e-7)

    # 3. posterior_cg predictions parity
    xs = jnp.linspace(0.5, 7.5, 23)
    p0 = posterior_cg(fx, y, tol=1e-10)
    p1 = posterior_cg(fx, y, tol=1e-10, mesh=mesh)
    m0, s0 = p0.mean_and_var(xs)
    m1, s1 = p1.mean_and_var(xs)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m0), rtol=1e-8)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s0), rtol=1e-6,
                               atol=1e-10)

    # 4. LaplaceCG Newton mode parity (chunked path: storage="chunked"
    # exercises the sharded kernel_matvec; plus the sharded K-resident tier)
    yb = (jax.random.uniform(jax.random.fold_in(key, 4), (N,)) > 0.5).astype(
        jnp.int32
    )
    lik = agp.BernoulliLikelihood()
    f0 = newton_inner_loop_cg(lik, yb, kern, x, cg_tol=1e-10, tol=1e-10,
                              precond_rank=0)
    for storage in ("chunked", "dense"):
        f1 = newton_inner_loop_cg(
            lik, yb, kern, x, cg_tol=1e-10, tol=1e-10, precond_rank=0,
            block_size=32, storage=storage, mesh=mesh,
        )
        np.testing.assert_allclose(np.asarray(f1), np.asarray(f0),
                                   rtol=1e-7, atol=1e-9)
