#!/usr/bin/env python
"""RNG cost in the degradation pipeline: threefry (JAX default) vs rbg.

The noise degradation draws B·H·W·3 normals per step; threefry2x32 is
compute-heavy on TPU while the rbg generator uses the hardware PRNG path.
Keys stay deterministic-from-seed either way (different streams).
"""

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

    clean = (
        jnp.abs(jnp.sin(jnp.arange(B * S * S * 3, dtype=jnp.float32) * 0.001))
        .reshape(B, S, S, 3)
        * 255.0
    )

    @jax.jit
    def deg(c, k):
        return apply_degradation("noise", c, k) / 255.0

    for impl in ("threefry2x32", "rbg"):
        key = jax.random.key(0, impl=impl)
        t = forced_timeit(lambda i: deg(clean, jax.random.fold_in(key, i)), 20)
        print(f"degrade noise with {impl:12s}: {t*1e3:6.2f} ms")

    # raw normal drawing cost for scale
    for impl in ("threefry2x32", "rbg"):
        key = jax.random.key(0, impl=impl)
        f = jax.jit(lambda k: jax.random.normal(k, (B, S, S, 3)))
        t = forced_timeit(lambda i: f(jax.random.fold_in(key, i)), 20)
        print(f"raw normal [B,S,S,3] {impl:12s}: {t*1e3:6.2f} ms")


if __name__ == "__main__":
    main()
