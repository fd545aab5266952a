from motionbert_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicated,
    shard_batch,
    maybe_shard_batch,
    padded_eval_batches,
    shard_params,
    param_partition_spec,
)
