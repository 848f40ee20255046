"""approximategps_tpu — a TPU-native approximate-Gaussian-process framework.

From-scratch JAX/XLA/Pallas re-design with the capabilities of
JuliaGaussianProcesses/ApproximateGPs.jl (reference layer map in SURVEY.md):
approximate inference in latent GP models — sparse variational (SVGP,
centered + whitened), Laplace (IFT-differentiated Newton), and
nearest-neighbor/Vecchia approximations — with the reference's two-function
public API:

- ``posterior(approx, lfx, ys)``: approximate posterior GP
- ``approx_lml(approx, lfx, ys)``: marginal-likelihood approximation for
  hyperparameter optimisation

plus the full implied stack the reference imports from its ecosystem
(kernels, GP objects, likelihoods, quadrature, exact-GP oracle) built
TPU-first: MXU-friendly Gram matrices, Pallas fused kernels, `lax` control
flow, `jax.sharding` data parallelism.
"""

from . import config as _config_module
from . import core, models, ops, parallel, utils
from .config import config, config_context, set_config
from .core import (
    GP,
    AbstractGP,
    Analytic,
    BernoulliLikelihood,
    ConstantKernel,
    ConstMean,
    DefaultExpectationMethod,
    DiagNormal,
    ExponentialKernel,
    ExponentialLikelihood,
    FiniteGP,
    FunctionLikelihood,
    FunctionMean,
    GammaLikelihood,
    NegativeBinomialLikelihood,
    GaussNewtonLikelihood,
    GaussHermite,
    GaussianLikelihood,
    InputScaledKernel,
    Kernel,
    LatentFiniteGP,
    LatentGP,
    Likelihood,
    LinearKernel,
    Matern12Kernel,
    Matern32Kernel,
    Matern52Kernel,
    MonteCarlo,
    MultivariateNormal,
    PeriodicKernel,
    PoissonLikelihood,
    PolynomialKernel,
    PosteriorGP,
    ProductKernel,
    RationalQuadraticKernel,
    RBFKernel,
    ScaledKernel,
    ScaleTransform,
    SEKernel,
    SqExponentialKernel,
    StudentTLikelihood,
    SumKernel,
    WhiteKernel,
    ZeroMean,
    as_likelihood,
    expected_loglikelihood,
    kl_divergence,
    logpdf,
    mvnormal_from_cov,
    predict_in_blocks,
    with_lengthscale,
)
from .models import (
    BlockNearestNeighbors,
    HeteroscedasticGaussianLikelihood,
    MultiLatentSVGP,
    SoftmaxLikelihood,
    multi_latent_elbo,
    SVGP,
    VFE,
    cg_solve,
    logpdf_slq,
    msqrt_matvec,
    posterior_cg,
    sample_posterior_msqrt,
    sample_prior_msqrt,
    rff_features,
    sample_svgp_functions,
    dp_streaming_elbo,
    streaming_elbo,
    GaussianSiteState,
    OnlineSVGPState,
    online_elbo,
    online_optimal_q,
    online_state,
    site_posterior_q,
    site_state,
    site_update,
    loo_logpdf,
    loo_mean_and_var,
    newton_inner_loop_jvp,
    BandInvRoot,
    SparseInvRoot,
    Centered,
    LaplaceApproximation,
    LaplacePosterior,
    NearestNeighbors,
    NonCentered,
    predict_knn,
    SparseVariationalApproximation,
    SVGPPosterior,
    approx_lml,
    build_laplace_objective,
    elbo,
    inducing_points,
    laplace_f_and_lml,
    laplace_lml,
    LaplaceCG,
    laplace_lml_cg,
    newton_inner_loop_cg,
    laplace_steps,
    laplace_steps_scan,
    newton_inner_loop,
    optimal_variational_posterior,
    posterior,
    prior_kl,
    vfe_elbo,
)

__version__ = "0.1.0"
