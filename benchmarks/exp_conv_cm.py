#!/usr/bin/env python
"""A/B: CM Pallas conv kernel vs XLA NHWC conv at CDAN decoder/encoder shapes.

Also times jax.image.resize ×2 upsampling in NHWC vs NCHW (the decoder-CM
plan needs CM upsampling to not regress).
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
    ("conv4", 256, 512, 32),
    ("de1", 512, 256, 32),
    ("de2", 256, 128, 32),
    ("de3", 128, 64, 64),
    ("de4", 64, 3, 128),
]


def main() -> None:
    from multi_degradation_image_enhancement_tpu.ops.pallas.conv_cm import (
        conv3x3_cm,
        conv_supported,
        pack_conv,
    )

    dt = jnp.bfloat16
    for name, ci, co, s in SHAPES:
        if not conv_supported(s, s, ci, co):
            print(f"{name}: packed mode unsupported, skipped")
            continue
        k = jax.random.normal(jax.random.key(0), (3, 3, ci, co), jnp.float32) * 0.05
        bias = jax.random.normal(jax.random.key(2), (co,), jnp.float32) * 0.1
        packed = pack_conv(k, bias)
        x = jax.random.normal(jax.random.key(1), (B, s, s, ci), jnp.float32).astype(dt)
        xcm = jnp.asarray(x.transpose(0, 3, 1, 2).reshape(B, ci, s * s))

        f_xla = jax.jit(
            lambda x: nn.relu(
                jax.lax.conv_general_dilated(
                    x, k.astype(dt), (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )
                + bias.astype(dt)
            )
        )
        f_cm = jax.jit(
            lambda x: conv3x3_cm(x, packed, hw_shape=(s, s), relu=True, interpret=False)
        )
        # correctness spot-check at bf16 tolerance
        ref = f_xla(x)
        got = f_cm(xcm)[:, :co, :].reshape(B, co, s, s).transpose(0, 2, 3, 1)
        md = float(jnp.abs(ref.astype(jnp.float32) - got.astype(jnp.float32)).max())
        t1 = forced_timeit(lambda i: f_xla(x), 20)
        t2 = forced_timeit(lambda i: f_cm(xcm), 20)
        print(
            f"{name:6s} {ci:3d}->{co:3d}@{s}²  XLA {t1*1e3:6.2f} ms   "
            f"CM-kernel {t2*1e3:6.2f} ms   maxdiff {md:.2e}"
        )

    # upsample ×2: NHWC vs NCHW resize at de3 output scale
    x = jax.random.normal(jax.random.key(3), (B, 64, 64, 128), jnp.float32).astype(dt)
    xc = jnp.asarray(x.transpose(0, 3, 1, 2))
    f_nhwc = jax.jit(
        lambda x: jax.image.resize(x, (B, 128, 128, 128), method="bilinear")
    )
    f_nchw = jax.jit(
        lambda x: jax.image.resize(x, (B, 128, 128, 128), method="bilinear")
    )
    t1 = forced_timeit(lambda i: f_nhwc(x), 20)
    t2 = forced_timeit(lambda i: f_nchw(xc), 20)
    print(f"ups ×2 128ch 64→128²   NHWC {t1*1e3:6.2f} ms   NCHW {t2*1e3:6.2f} ms")


if __name__ == "__main__":
    main()
