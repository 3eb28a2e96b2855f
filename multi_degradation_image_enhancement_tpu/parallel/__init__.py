from multi_degradation_image_enhancement_tpu.parallel.mesh import (
    DATA_AXIS,
    SPATIAL_AXIS,
    batch_sharding,
    batch_spec,
    create_mesh,
    replicate,
    replicated,
    shard_batch,
    shard_eval_step,
    shard_train_step,
)

__all__ = [
    "DATA_AXIS",
    "SPATIAL_AXIS",
    "batch_sharding",
    "batch_spec",
    "create_mesh",
    "replicate",
    "replicated",
    "shard_batch",
    "shard_eval_step",
    "shard_train_step",
]
