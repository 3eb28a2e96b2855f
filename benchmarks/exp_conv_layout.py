#!/usr/bin/env python
"""XLA conv speed: NHWC-logical vs NCHW-logical dimension numbers.

If NCHW-logical convs run at NHWC speed (XLA's layout assignment is free to
pick physical layouts inside jit), the serving path can stay channel-major
end-to-end and the remaining Pallas-boundary transposes disappear.
Times every CDAN conv shape at B=128, plus maxpool in both layouts.
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
SHAPES = [  # (name, c_in, c_out, hw)
    ("conv1", 3, 64, 256),
    ("conv2", 64, 128, 128),
    ("conv3", 128, 256, 64),
    ("conv4", 256, 512, 32),
    ("de1", 512, 256, 32),
    ("de2", 256, 128, 32),
    ("de3", 128, 64, 64),
    ("de4", 64, 3, 128),
]


def main() -> None:
    dt = jnp.bfloat16
    for name, ci, co, s in SHAPES:
        k = jax.random.normal(jax.random.key(0), (3, 3, ci, co), jnp.float32).astype(dt) * 0.05
        x_nhwc = jax.random.normal(jax.random.key(1), (B, s, s, ci), jnp.float32).astype(dt)
        x_nchw = jnp.asarray(x_nhwc.transpose(0, 3, 1, 2))

        @jax.jit
        def f_nhwc(x):
            y = jax.lax.conv_general_dilated(
                x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
            )
            return nn.relu(y)

        @jax.jit
        def f_nchw(x):
            y = jax.lax.conv_general_dilated(
                x, k, (1, 1), "SAME", dimension_numbers=("NCHW", "HWIO", "NCHW")
            )
            return nn.relu(y)

        t1 = forced_timeit(lambda i: f_nhwc(x_nhwc), 20)
        t2 = forced_timeit(lambda i: f_nchw(x_nchw), 20)
        print(f"{name:6s} {ci:3d}->{co:3d}@{s}²  NHWC {t1*1e3:6.2f} ms   NCHW {t2*1e3:6.2f} ms")

    # maxpool 2x2 both layouts at the conv1 scale
    x_nhwc = jax.random.normal(jax.random.key(2), (B, 256, 256, 64), jnp.float32).astype(dt)
    x_nchw = jnp.asarray(x_nhwc.transpose(0, 3, 1, 2))
    f1 = jax.jit(lambda x: nn.max_pool(x, (2, 2), strides=(2, 2)))
    f2 = jax.jit(
        lambda x: jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (1, 1, 2, 2), (1, 1, 2, 2), "VALID"
        )
    )
    t1 = forced_timeit(lambda i: f1(x_nhwc), 20)
    t2 = forced_timeit(lambda i: f2(x_nchw), 20)
    print(f"maxpool 64ch@256²      NHWC {t1*1e3:6.2f} ms   NCHW {t2*1e3:6.2f} ms")


if __name__ == "__main__":
    main()
