from . import api, block_vecchia, crossval, iterative, laplace, laplace_cg, multi_latent, sampling, svgp, svgp_online, svgp_streaming, vecchia, vfe
from .crossval import loo_logpdf, loo_mean_and_var
from .iterative import (cg_solve, logpdf_slq, posterior_cg,
                        msqrt_matvec, sample_prior_msqrt,
                        sample_posterior_msqrt)
from .sampling import rff_features, sample_posterior_functions_cg, sample_svgp_functions
from .svgp_streaming import dp_streaming_elbo, streaming_elbo
from .svgp_online import (
    GaussianSiteState,
    OnlineSVGPState,
    online_elbo,
    online_optimal_q,
    online_state,
    site_posterior_q,
    site_state,
    site_update,
)
from .api import approx_lml, posterior
from .laplace_cg import (
    LaplaceCG,
    LaplaceCGPosterior,
    laplace_lml_cg,
    newton_inner_loop_cg,
)
from .laplace import (
    LaplaceApproximation,
    LaplacePosterior,
    LaplaceResult,
    build_laplace_objective,
    laplace_f_and_lml,
    laplace_f_cov,
    laplace_lml,
    laplace_steps,
    laplace_steps_scan,
    newton_inner_loop,
    newton_inner_loop_jvp,
)
from .svgp import (
    SVGP,
    Centered,
    NonCentered,
    SparseVariationalApproximation,
    SVGPPosterior,
    elbo,
    inducing_points,
    prior_kl,
)
from .vecchia import (
    BandInvRoot,
    NearestNeighbors,
    SparseInvRoot,
    approx_root_prec_band,
    approx_root_prec_sparse,
    predict_knn,
    resolve_ordering,
)
from .vfe import VFE, optimal_variational_posterior, vfe_elbo
from .multi_latent import (
    HeteroscedasticGaussianLikelihood,
    MultiLatentSVGP,
    SoftmaxLikelihood,
    multi_latent_elbo,
)
from .block_vecchia import BlockInvRoot, BlockNearestNeighbors
