#!/usr/bin/env python
"""A/B the `_DB_BF16_ACT` serving variant (bf16 per-layer VPU work in the
fused DenseBlock kernels) at the headline bench shape.

PERF.md round-3 names the DB kernels' per-layer f32 elementwise work
(~15 ms in-context) as the biggest remaining block on the way to
≥4,000 img/s; `_DB_BF16_ACT=True` halves its width.  Run both settings in
one process, forced execution, serialized (memory: axon-tpu-measurement).

Usage: python benchmarks/ab_bf16_act.py [--batch 128] [--size 256] [--iters 20]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import multi_degradation_image_enhancement_tpu.models.cdan_fast as cf
    from benchmarks.microbench import forced_timeit
    from multi_degradation_image_enhancement_tpu.models.cdan import CDAN
    from multi_degradation_image_enhancement_tpu.ops.degradations import (
        apply_degradation,
    )

    dtype = jnp.bfloat16
    model = CDAN(dtype=dtype)
    variables = model.init(
        {"params": jax.random.key(0)},
        jnp.zeros((1, args.size, args.size, 3), jnp.float32),
        train=False,
    )
    clean = (
        jnp.abs(
            jnp.sin(
                jnp.arange(args.batch * args.size * args.size * 3, dtype=jnp.float32)
                * 0.001
            )
        ).reshape(args.batch, args.size, args.size, 3)
        * 255.0
    )
    key = jax.random.key(7)

    ref_out = None
    for flag in (False, True):
        cf._DB_BF16_ACT = flag
        forward = cf.build_serving_apply(variables, dtype)

        @jax.jit
        def step(c, k):
            return forward(apply_degradation("noise", c, k) / 255.0)

        out = step(clean, key)
        if ref_out is None:
            ref_out = jax.device_get(out).astype("float32")
        else:
            import numpy as np

            diff = float(
                np.abs(jax.device_get(out).astype("float32") - ref_out).max()
            )
            print(f"maxdiff vs f32-act: {diff:.3e}", flush=True)
        dt = forced_timeit(lambda i: step(clean, jax.random.fold_in(key, i)), args.iters)
        print(
            f"_DB_BF16_ACT={flag}: {dt*1e3:7.2f} ms/step  "
            f"{args.batch/dt:7.1f} img/s",
            flush=True,
        )


if __name__ == "__main__":
    main()
