from seggroup_tpu.parallel.dp import (
    make_mesh,
    shard_batch,
    replicate,
    build_stage1_train_step,
    build_stage1_infer_step,
)
