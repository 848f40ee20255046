from . import data_parallel, serving
from .data_parallel import (
    data_mesh,
    make_dp_elbo,
    make_dp_train_step,
    replicated,
    shard_batch,
)
from .serving import dp_predict_blocks
