from seggroup_tpu.sparse.tensor import SparseTensor
from seggroup_tpu.sparse.conv import (
    build_subm_rulebook,
    subm_conv,
    strided_conv_down,
    inverse_conv_up,
    sparse_batch_norm_stats,
    global_pool,
)
