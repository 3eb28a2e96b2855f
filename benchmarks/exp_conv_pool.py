#!/usr/bin/env python
"""A/B: fused polyphase conv+pool kernel vs the XLA conv→reduce_window chain.

Includes the deinterleave prep pass on the kernel side (honest end-to-end
per encoder stage).  B=128, bf16.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from flax import linen as nn

from benchmarks.microbench import forced_timeit

B = 128
SHAPES = [
    ("conv1p", 3, 64, 256),
    ("conv2p", 64, 128, 128),
    ("conv3p", 128, 256, 64),
]


def main() -> None:
    from multi_degradation_image_enhancement_tpu.ops.pallas.conv_pool_cm import (
        conv3x3_pool_cm,
        conv_pool_supported,
        deinterleave_cols,
        pack_conv_pool,
    )

    dt = jnp.bfloat16
    for name, ci, co, s in SHAPES:
        if not conv_pool_supported(s, s, ci, co):
            print(f"{name}: unsupported at this VMEM target, skipped")
            continue
        cip = ((ci + 7) // 8) * 8
        k = jax.random.normal(jax.random.key(0), (3, 3, ci, co), jnp.float32) * 0.05
        bias = jax.random.normal(jax.random.key(2), (co,), jnp.float32) * 0.1
        packed = pack_conv_pool(k, bias)
        x = jax.random.normal(jax.random.key(1), (B, s, s, ci), jnp.float32).astype(dt)
        xcm = x.transpose(0, 3, 1, 2).reshape(B, ci, s * s)
        if ci != cip:
            xcm = jnp.pad(xcm, ((0, 0), (0, cip - ci), (0, 0)))
        xcm = jnp.asarray(xcm)

        f_xla = jax.jit(
            lambda x: nn.max_pool(
                nn.relu(
                    jax.lax.conv_general_dilated(
                        x, k.astype(dt), (1, 1), "SAME",
                        dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    )
                    + bias.astype(dt)
                ),
                (2, 2),
                strides=(2, 2),
            )
        )
        f_cm = jax.jit(
            lambda xc: conv3x3_pool_cm(
                deinterleave_cols(xc, (s, s)), packed, hw_shape=(s, s), interpret=False
            )
        )
        ref = f_xla(x)
        got = f_cm(xcm)[:, :co, :].reshape(B, co, s // 2, s // 2).transpose(0, 2, 3, 1)
        md = float(jnp.abs(ref.astype(jnp.float32) - got.astype(jnp.float32)).max())
        t1 = forced_timeit(lambda i: f_xla(x), 20)
        t2 = forced_timeit(lambda i: f_cm(xcm), 20)
        print(
            f"{name:7s} {ci:3d}->{co:3d}@{s}²  XLA conv+pool {t1*1e3:6.2f} ms   "
            f"fused kernel {t2*1e3:6.2f} ms   maxdiff {md:.2e}"
        )


if __name__ == "__main__":
    main()
