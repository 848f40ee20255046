from .npgp import (
    rbf,
    exact_gpr_logpdf,
    exact_gpr_predict,
    svgp_elbo_centered,
    svgp_elbo_noncentered,
    vfe_bound,
    laplace_lml_bernoulli,
    vecchia_lml,
)

__all__ = [
    "rbf",
    "exact_gpr_logpdf",
    "exact_gpr_predict",
    "svgp_elbo_centered",
    "svgp_elbo_noncentered",
    "vfe_bound",
    "laplace_lml_bernoulli",
    "vecchia_lml",
]
