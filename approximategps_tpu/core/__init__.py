from . import distributions, gp, kernels, likelihoods, linalg, means, quadrature
from .distributions import DiagNormal, MultivariateNormal, kl_divergence, mvnormal_from_cov
from .gp import (
    GP,
    AbstractGP,
    CholeskyRep,
    FiniteGP,
    LatentFiniteGP,
    LatentGP,
    PosteriorGP,
    logpdf,
    posterior,
    predict_in_blocks,
)
from .kernels import (
    ConstantKernel,
    ExponentialKernel,
    InputScaledKernel,
    Kernel,
    LinearKernel,
    Matern12Kernel,
    Matern32Kernel,
    Matern52Kernel,
    PeriodicKernel,
    PolynomialKernel,
    ProductKernel,
    RBFKernel,
    RationalQuadraticKernel,
    ScaledKernel,
    ScaleTransform,
    SEKernel,
    SqExponentialKernel,
    StationaryKernel,
    SumKernel,
    WhiteKernel,
    with_lengthscale,
)
from .likelihoods import (
    BernoulliLikelihood,
    ExponentialLikelihood,
    FunctionLikelihood,
    GammaLikelihood,
    NegativeBinomialLikelihood,
    GaussNewtonLikelihood,
    GaussianLikelihood,
    Likelihood,
    PoissonLikelihood,
    StudentTLikelihood,
    as_likelihood,
)
from .means import ConstMean, FunctionMean, ZeroMean
from .pytrees import pytree_dataclass, static_field
from .quadrature import (
    Analytic,
    DefaultExpectationMethod,
    GaussHermite,
    MonteCarlo,
    expected_loglikelihood,
)
