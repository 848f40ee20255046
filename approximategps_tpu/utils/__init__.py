from . import bijectors, checkpoint, data, profiling, training
from .bijectors import (
    cholesky_parameter,
    fill_triangular,
    fill_triangular_inverse,
    invsoftplus,
    positive,
    softplus,
)
from .checkpoint import latest_step, restore_checkpoint, save_checkpoint
from .training import (
    SVGPParams,
    adam_fit,
    build_svgp,
    init_svgp_params,
    lbfgs_fit,
    make_natgrad_adam_step,
    natgrad_update,
    natgrad_update_tril,
)
from .profiling import StepTimer, named_scope, time_fn, trace
from .data import epoch_batches, minibatch_iterator
from .priors import (
    gamma_prior,
    halfnormal_prior,
    log_prior,
    lognormal_prior,
    map_objective,
    normal_prior,
)
