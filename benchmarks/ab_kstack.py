#!/usr/bin/env python
"""A/B the DenseBlock kernels' K-stack width at the headline bench shape.

The growth conv's roll-after-matmul form runs each dx tap as a K=ci matmul;
for final_dense (ci ∈ {16,32,48,64}) that is ≤50% MXU utilisation and the
three taps cost the wall-clock of a full-width matmul 3× their FLOPs
(memory: mosaic-pallas-limits, "tiny-K matmuls drown in tile-ops").
`_DB_K_STACK_MAX_CI` switches layers at/below the width to one K-stacked
``A[48,3ci] @ [roll;v;roll]`` matmul.  Sweep 0 (off) / 48 (final_dense's
first three layers) / 80 (also ci∈{64,80} of dense1 + final_dense's last),
crossed with the better `_DB_BF16_ACT` setting if known.

Usage: python benchmarks/ab_kstack.py [--batch 128] [--size 256] [--iters 20]
       [--bf16-act]
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
    ap.add_argument("--bf16-act", action="store_true",
                    help="run the sweep with _DB_BF16_ACT=True")
    ap.add_argument("--widths", type=str, default="0,48,80")
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

    cf._DB_BF16_ACT = args.bf16_act
    ref_out = None
    for k in [int(s) for s in args.widths.split(",") if s]:
        cf._DB_K_STACK_MAX_CI = k
        forward = cf.build_serving_apply(variables, dtype)

        @jax.jit
        def step(c, kk):
            return forward(apply_degradation("noise", c, kk) / 255.0)

        out = step(clean, key)
        if ref_out is None:
            ref_out = jax.device_get(out).astype("float32")
        else:
            import numpy as np

            diff = float(
                np.abs(jax.device_get(out).astype("float32") - ref_out).max()
            )
            print(f"k={k}: maxdiff vs k=0: {diff:.3e}", flush=True)
        dt = forced_timeit(lambda i: step(clean, jax.random.fold_in(key, i)), args.iters)
        print(
            f"_DB_K_STACK_MAX_CI={k:3d} (bf16_act={args.bf16_act}): "
            f"{dt*1e3:7.2f} ms/step  {args.batch/dt:7.1f} img/s",
            flush=True,
        )


if __name__ == "__main__":
    main()
