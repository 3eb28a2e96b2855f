#!/usr/bin/env python
"""Break down the cm-DenseBlock boundary cost at each CDAN shape.

For each DB grid, times separately (forced execution, in isolation):
  prelude : NHWC -> [B, c0p, halo|HW|halo] transpose+pad (+ packed-mode pack)
  kernel  : _run_cm on a PREPPED input via the private entry (approximated by
            running _run_cm on an NHWC input already resident — measures
            prelude+kernel; kernel-only = this minus prelude)
  postlude: [B, c_outp, HW] -> NHWC slice+transpose+reshape
  whole   : fused_dense_block-equivalent chain (prelude+kernel+postlude)

Usage: python benchmarks/exp_db_glue.py [--batch 128]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from benchmarks.microbench import forced_timeit


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()
    B = args.batch

    from multi_degradation_image_enhancement_tpu.models.cdan import CDAN, DenseBlock
    from multi_degradation_image_enhancement_tpu.ops.pallas.dense_block_cm import (
        HALO_ROWS,
        _ceil16,
        _run_cm,
        pack_params_cm,
    )

    shapes = [(64, 128), (3, 256), (128, 64), (256, 32)]
    for c_in, hw_side in shapes:
        H = W = hw_side
        db = DenseBlock(features=c_in, dtype=jnp.bfloat16)
        variables = db.init(
            {"params": jax.random.key(0)}, jnp.zeros((1, H, W, c_in), jnp.float32), train=False
        )
        packed = pack_params_cm(variables["params"], variables["batch_stats"], c_in)
        x = (
            jnp.abs(jnp.sin(jnp.arange(B * H * W * c_in, dtype=jnp.float32)))
            .reshape(B, H, W, c_in)
            .astype(jnp.bfloat16)
        )
        c0p = _ceil16(c_in)
        hw = H * W
        halo = HALO_ROWS * W
        l_img = hw + 2 * halo
        c_outp = packed["At"].shape[0]

        @jax.jit
        def prelude(x):
            xcm = x.transpose(0, 3, 1, 2).reshape(B, c_in, hw)
            return jnp.pad(xcm, ((0, 0), (0, c0p - c_in), (halo, halo)))

        @jax.jit
        def whole(x):
            out = _run_cm(x, packed, c_in=c_in, interpret=False)
            return out[:, :c_in, :].transpose(0, 2, 1).reshape(B, H, W, c_in)

        @jax.jit
        def kernel_from_nhwc(x):
            return _run_cm(x, packed, c_in=c_in, interpret=False)

        out_cm = kernel_from_nhwc(x)

        @jax.jit
        def postlude(o):
            return o[:, :c_in, :].transpose(0, 2, 1).reshape(B, H, W, c_in)

        t_pre = forced_timeit(lambda i: prelude(x), args.iters)
        t_kp = forced_timeit(lambda i: kernel_from_nhwc(x), args.iters)
        t_post = forced_timeit(lambda i: postlude(out_cm), args.iters)
        t_whole = forced_timeit(lambda i: whole(x), args.iters)
        print(
            f"DB({c_in:3d})@{hw_side}² : prelude {t_pre*1e3:6.2f}  "
            f"pre+kernel {t_kp*1e3:6.2f}  postlude {t_post*1e3:6.2f}  "
            f"whole {t_whole*1e3:6.2f} ms"
        )


if __name__ == "__main__":
    main()
