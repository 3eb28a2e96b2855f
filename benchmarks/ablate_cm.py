#!/usr/bin/env python
"""In-context ablation of the all-channel-major serving forward.

Times the FULL jitted degrade→restore step built by
``cdan_fast.build_fast_apply_cm``, then variants with one stage group
swapped for an XLA equivalent (or identity), by monkeypatching the module
globals the builder resolves at trace time.  Differences of full-step times
are the honest in-context cost of each group (standalone stage timings are
polluted by per-call dispatch overhead on this backend — see PERF.md).

Usage: python benchmarks/ablate_cm.py [--batch 128] [--size 256] [--only a,b]
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
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--iters", type=int, default=15)
    ap.add_argument("--only", type=str, default="")
    args = ap.parse_args()
    B, S = args.batch, args.size
    dtype = jnp.bfloat16
    only = [s for s in args.only.split(",") if s]

    from multi_degradation_image_enhancement_tpu.models import cdan_fast
    from multi_degradation_image_enhancement_tpu.models.cdan import CDAN
    from multi_degradation_image_enhancement_tpu.ops.degradations import apply_degradation
    from multi_degradation_image_enhancement_tpu.ops.pallas.dense_block_cm import _ceil16

    model = CDAN(dtype=dtype)
    variables = model.init(
        {"params": jax.random.key(0)}, jnp.zeros((1, S, S, 3), jnp.float32), train=False
    )
    clean = (
        jnp.abs(jnp.sin(jnp.arange(B * S * S * 3, dtype=jnp.float32) * 0.001)).reshape(
            B, S, S, 3
        )
        * 255.0
    )
    key = jax.random.key(0)

    # ---- XLA / identity replacements ------------------------------------

    def conv_xla(x_cm, packed, *, hw_shape, relu=True, interpret=False):
        b, c_in, hw = x_cm.shape
        h, w = hw_shape
        a = packed["A"]
        c_outp = packed["bias"].shape[0]
        # invert pack_conv: A rows are (dy, c_out), col blocks are dx taps
        k = a.reshape(3, c_outp, 3, c_in).transpose(0, 2, 3, 1)  # HWIO
        y = jax.lax.conv_general_dilated(
            x_cm.reshape(b, c_in, h, w).astype(x_cm.dtype),
            k.astype(x_cm.dtype),
            (1, 1),
            "SAME",
            dimension_numbers=("NCHW", "HWIO", "NCHW"),
        ) + packed["bias"].astype(x_cm.dtype)[None, :, :1, None]
        if relu:
            y = jnp.maximum(y, 0)
        return y.reshape(b, c_outp, hw)

    def deint_id(x_cm, hw_shape):
        return x_cm

    def conv_pool_xla(x_cm, packed, *, hw_shape, interpret=False):
        from flax import linen as nn

        b, c_inp, hw = x_cm.shape
        h, w = hw_shape
        kinds = packed["A"]  # [9*c_inp? ...] — rebuild not practical; use raw
        raise SystemExit("conv_pool_xla needs the unpacked kernel — handled below")

    def cbam_id(x, pack, hw_shape, dtype):
        return x

    def db_id(x, packed, *, c_in, hw_shape, interpret=False):
        c_pad = _ceil16(c_in) - x.shape[1]
        if c_pad > 0:
            x = jnp.pad(x, ((0, 0), (0, c_pad), (0, 0)))
        return x

    def pool_rw(x, hw_shape):
        from flax import linen as nn

        b, c, hw = x.shape
        h, w = hw_shape
        y = nn.max_pool(
            x.reshape(b, c, h, w).transpose(0, 2, 3, 1), (2, 2), strides=(2, 2)
        )
        return y.transpose(0, 3, 1, 2).reshape(b, c, hw // 4)

    # conv1 via XLA NHWC conv+pool from the ORIGINAL folded weights
    folded1 = cdan_fast._fold_all(variables)["conv1"]

    def conv1_xla_chain(x_dei, packed, *, hw_shape, interpret=False):
        from flax import linen as nn

        b, c_inp, hw = x_dei.shape
        h, w = hw_shape
        x = x_dei[:, :3, :].reshape(b, 3, h, w).transpose(0, 2, 3, 1)
        k, bias = folded1
        y = jax.lax.conv_general_dilated(
            x.astype(x_dei.dtype),
            k.astype(x_dei.dtype),
            (1, 1),
            "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + bias.astype(x_dei.dtype)
        y = nn.max_pool(jnp.maximum(y, 0), (2, 2), strides=(2, 2))
        return y.transpose(0, 3, 1, 2).reshape(b, 64, hw // 4)

    variants = {
        "base": {},
        "conv→xla_nchw": {"conv3x3_cm": conv_xla},
        "conv1pool→xla_nhwc": {
            "deinterleave_cols": deint_id,
            "conv3x3_pool_cm": conv1_xla_chain,
        },
        "cbam→skip": {"_cbam_cm": cbam_id},
        "db→skip": {"_run_cm2": db_id},
        "pool→reduce_window": {"_maxpool2x2_cm": pool_rw},
    }

    saved = {}
    for name, patches in variants.items():
        if only and name not in only:
            continue
        for attr, fn in patches.items():
            saved[attr] = getattr(cdan_fast, attr)
            setattr(cdan_fast, attr, fn)
        try:
            fwd = cdan_fast.build_fast_apply_cm(variables, dtype)
            step = jax.jit(lambda c, k, f=fwd: f(apply_degradation("noise", c, k) / 255.0))
            dt = forced_timeit(lambda i: step(clean, jax.random.fold_in(key, i)), args.iters)
            print(f"{name:26s} {dt*1e3:8.2f} ms   {B/dt:8.0f} img/s", flush=True)
        finally:
            for attr in patches:
                setattr(cdan_fast, attr, saved[attr])


if __name__ == "__main__":
    main()
