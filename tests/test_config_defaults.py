"""Fast-path defaults (VERDICT r2 item 3): config ships solve_mode="auto" /
matmul_precision="auto", resolving to the benched TPU fast path
(inv_matmul + bf16-accumulate matmuls → S-correction cache + fused epilogue)
for f32/bf16 on TPU, and to the exact oracle paths (triangular + highest)
for f64 or non-TPU backends — so `elbo` users get the 4.3 ms headline
configuration without copying bench.py's set_config calls."""

import jax
import jax.numpy as jnp

from approximategps_tpu.config import (
    config,
    config_context,
    resolve_matmul_precision,
    resolve_solve_mode,
)


def test_defaults_are_auto():
    assert config.solve_mode == "auto"
    assert config.matmul_precision == "auto"


def test_auto_resolves_to_oracle_paths_off_tpu():
    # conftest forces the cpu backend
    assert jax.default_backend() != "tpu"
    assert resolve_solve_mode(jnp.float32) == "triangular"
    assert resolve_solve_mode(jnp.float64) == "triangular"
    assert resolve_matmul_precision(jnp.float32) == "highest"


def test_auto_resolves_to_fast_path_on_tpu(monkeypatch):
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert resolve_solve_mode(jnp.float32) == "inv_matmul"
    assert resolve_solve_mode(jnp.bfloat16) == "inv_matmul"
    assert resolve_matmul_precision(jnp.float32) == "default"
    # f64 oracle dtype keeps the exact paths even on TPU
    assert resolve_solve_mode(jnp.float64) == "triangular"
    assert resolve_matmul_precision(jnp.float64) == "highest"
    # dtype unknown → fast path on TPU
    assert resolve_solve_mode() == "inv_matmul"


def test_auto_solve_mode_gates_on_size(monkeypatch):
    """The auto fast path engages only at MXU-bound M (>= 512): small-M
    problems are latency-trivial for triangular AND are where
    near-coincident inducing points make an explicit f32 inverse unsafe
    (example a, M=20: inv_matmul diverges, triangular converges)."""
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert resolve_solve_mode(jnp.float32, size=512) == "inv_matmul"
    assert resolve_solve_mode(jnp.float32, size=2048) == "inv_matmul"
    assert resolve_solve_mode(jnp.float32, size=511) == "triangular"
    assert resolve_solve_mode(jnp.float32, size=20) == "triangular"
    # explicit setting overrides the gate in both directions
    with config_context(solve_mode="inv_matmul"):
        assert resolve_solve_mode(jnp.float32, size=20) == "inv_matmul"
    with config_context(solve_mode="triangular"):
        assert resolve_solve_mode(jnp.float32, size=2048) == "triangular"


def test_explicit_values_pass_through(monkeypatch):
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    with config_context(solve_mode="triangular", matmul_precision="highest"):
        assert resolve_solve_mode(jnp.float32) == "triangular"
        assert resolve_matmul_precision(jnp.float32) == "highest"
    with config_context(solve_mode="inv_matmul", matmul_precision="default"):
        assert resolve_solve_mode(jnp.float64) == "inv_matmul"
        assert resolve_matmul_precision(jnp.float64) == "default"


def test_posterior_uses_fast_cache_on_mocked_tpu(monkeypatch):
    """End-to-end: with the backend reporting "tpu", a plain f32 posterior()
    build picks the inv_matmul cache (Lk_inv + S_corr present) — the
    S-correction + fused-epilogue prerequisites — while f64 stays exact."""
    import approximategps_tpu as agp

    f = agp.GP(agp.SqExponentialKernel())
    M = 512  # >= the auto fast-path size gate
    z = jnp.linspace(-50.0, 50.0, M)

    def build(dtype):
        q = agp.MultivariateNormal(
            jnp.zeros(M, dtype), jnp.eye(M, dtype=dtype)
        )
        fz_t = f(z.astype(dtype), jnp.asarray(1e-4, dtype))
        sva = agp.SparseVariationalApproximation(fz_t, q)
        return agp.posterior(sva)

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    # chol_mode="xla": the mocked backend would otherwise dispatch the
    # Pallas panel kernel onto the real CPU backend (compile error)
    with config_context(chol_mode="xla"):
        post32 = build(jnp.float32)
        assert post32.cache.Lk_inv is not None
        assert post32.cache.S_corr is not None
        post64 = build(jnp.float64)
        assert post64.cache.Lk_inv is None


def test_auto_compute_dtype_gates_on_m(monkeypatch):
    """compute_dtype='auto' (the default): bf16 projection storage engages
    on TPU f32 only at M >= bf16_storage_min_m — its OWN gate (ADVICE r4:
    a production-numerics switch must not ride the tri_matmul_min_m flop
    gate), defaulting to 4096 where the (M, B) HBM traffic floors the step
    (M=8192: 80.0 -> 74.9 ms); a wash at M=2048 (measured A/B), so f32
    stays there.  f64 oracle inputs are never downcast."""
    from approximategps_tpu.models.svgp import _storage_dtype

    assert config.compute_dtype == "auto"
    assert config.bf16_storage_min_m == 4096
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert _storage_dtype(jnp.float32, 8192) == jnp.bfloat16
    assert _storage_dtype(jnp.float32, 4096) == jnp.bfloat16
    assert _storage_dtype(jnp.float32, 2048) is None
    assert _storage_dtype(jnp.float32, None) is None
    assert _storage_dtype(jnp.float64, 8192) is None
    # the storage gate is independent of the flop gate
    with config_context(tri_matmul_min_m=16):
        assert _storage_dtype(jnp.float32, 2048) is None
    with config_context(bf16_storage_min_m=1024):
        assert _storage_dtype(jnp.float32, 2048) == jnp.bfloat16
    with config_context(compute_dtype="bfloat16"):
        assert _storage_dtype(jnp.float32, 32) == jnp.bfloat16
    with config_context(compute_dtype="float32"):
        assert _storage_dtype(jnp.float32, 8192) is None
    # off-TPU auto never downcasts
    monkeypatch.setattr(jax, "default_backend", lambda: "cpu")
    assert _storage_dtype(jnp.float32, 8192) is None
