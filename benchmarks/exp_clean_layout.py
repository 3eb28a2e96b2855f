#!/usr/bin/env python
"""Does the bench's clean-input layout (NHWC f32, C-minor tile-padded in HBM)
tax every step?  A/B: [B,256,256,3] f32 vs [B,3,256,256] u8 + in-jit transpose."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from benchmarks.microbench import forced_timeit


def main() -> None:
    B, S = 128, 256
    from multi_degradation_image_enhancement_tpu.ops.degradations import apply_degradation

    base = jnp.abs(jnp.sin(jnp.arange(B * S * S * 3, dtype=jnp.float32) * 0.001)) * 255.0

    clean_nhwc = base.reshape(B, S, S, 3)
    clean_chw_u8 = (
        base.reshape(B, S, S, 3).transpose(0, 3, 1, 2).astype(jnp.uint8)
    )
    key = jax.random.key(0)

    @jax.jit
    def deg_nhwc(c, k):
        return apply_degradation("noise", c, k) / 255.0

    @jax.jit
    def deg_chw(c, k):
        nhwc = c.transpose(0, 2, 3, 1).astype(jnp.float32)
        return apply_degradation("noise", nhwc, k) / 255.0

    t = forced_timeit(lambda i: deg_nhwc(clean_nhwc, jax.random.fold_in(key, i)), 20)
    print(f"degrade from NHWC f32 param : {t*1e3:6.2f} ms")
    t = forced_timeit(lambda i: deg_chw(clean_chw_u8, jax.random.fold_in(key, i)), 20)
    print(f"degrade from CHW u8 param   : {t*1e3:6.2f} ms")


if __name__ == "__main__":
    main()
