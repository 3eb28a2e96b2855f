#!/usr/bin/env python
"""2×2 maxpool formulations in XLA at the conv1 scale (B=128, 64ch@256²).

``reduce_window`` measured 9.1 ms standalone (exp_conv_layout) — far above
its ~3.2 ms bandwidth floor.  Candidates: shifted-max + strided slice, and
reshape-max (split H and W into pairs and reduce).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from flax import linen as nn

from benchmarks.microbench import forced_timeit


def main() -> None:
    B, S, C = 128, 256, 64
    x = jax.random.normal(jax.random.key(0), (B, S, S, C), jnp.float32).astype(jnp.bfloat16)

    f_rw = jax.jit(lambda x: nn.max_pool(x, (2, 2), strides=(2, 2)))

    @jax.jit
    def f_shift(x):
        m = jnp.maximum(x[:, 0::2], x[:, 1::2])  # row pairs: [B,S/2,S,C]
        return jnp.maximum(m[:, :, 0::2], m[:, :, 1::2])

    @jax.jit
    def f_reshape(x):
        r = x.reshape(B, S // 2, 2, S // 2, 2, C)
        return r.max(axis=(2, 4))

    ref = f_rw(x)
    for name, f in [("reduce_window", f_rw), ("strided-max", f_shift), ("reshape-max", f_reshape)]:
        out = f(x)
        ok = bool(jnp.all(out == ref))
        t = forced_timeit(lambda i: f(x), 20)
        print(f"{name:14s}: ok={ok}  {t*1e3:6.2f} ms")


if __name__ == "__main__":
    main()
