from . import data_parallel
from .data_parallel import (
    data_mesh,
    make_dp_elbo,
    make_dp_train_step,
    replicated,
    shard_batch,
)
