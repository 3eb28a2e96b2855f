"""Pallas TPU kernels for the serving fast path.

- ``dense_block``     — row-major fused DenseBlock (v1, historical)
- ``dense_block_cm``  — channel-major fused DenseBlock (production: the
  fused-I/O ``_run_cm2`` is the serving default via ``models/cdan_fast``)
- ``conv_cm``         — channel-major fused conv3×3+BN+ReLU (library block)
- ``conv_pool_cm``    — polyphase fused conv+pool (library block; wins
  standalone, loses in-context — PERF.md)
"""

from multi_degradation_image_enhancement_tpu.ops.pallas.conv_cm import conv3x3_cm, pack_conv
from multi_degradation_image_enhancement_tpu.ops.pallas.conv_pool_cm import (
    conv3x3_pool_cm,
    deinterleave_cols,
    pack_conv_pool,
)
from multi_degradation_image_enhancement_tpu.ops.pallas.dense_block import fused_dense_block
from multi_degradation_image_enhancement_tpu.ops.pallas.dense_block_cm import (
    fused_dense_block_cm,
)

__all__ = [
    "conv3x3_cm",
    "conv3x3_pool_cm",
    "deinterleave_cols",
    "fused_dense_block",
    "fused_dense_block_cm",
    "pack_conv",
    "pack_conv_pool",
]
