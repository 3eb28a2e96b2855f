from multi_degradation_image_enhancement_tpu.ops.degradations import (
    DEGRADATIONS,
    apply_degradation,
    apply_with_params,
    degrade_batch,
    sample_params,
)

__all__ = [
    "DEGRADATIONS",
    "apply_degradation",
    "apply_with_params",
    "degrade_batch",
    "sample_params",
]
