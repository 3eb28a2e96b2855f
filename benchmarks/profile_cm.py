#!/usr/bin/env python
"""Standalone stage timings of the all-channel-major serving forward.

Times each stage of ``cdan_fast.build_fast_apply_cm`` in isolation (forced
execution — see PERF.md) at the B=128 256² serving shape, to locate where
the CM step's time goes.  Stage list mirrors apply_fn's program order.

Usage: python benchmarks/profile_cm.py [--batch 128] [--size 256]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks.microbench import forced_timeit


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument(
        "--only", type=str, default="", help="comma-separated stage-name filter"
    )
    args = ap.parse_args()
    B, S = args.batch, args.size
    dtype = jnp.bfloat16
    only = [s for s in args.only.split(",") if s]

    from multi_degradation_image_enhancement_tpu.models import cdan_fast
    from multi_degradation_image_enhancement_tpu.models.cdan import CDAN
    from multi_degradation_image_enhancement_tpu.ops.pallas.conv_cm import conv3x3_cm
    from multi_degradation_image_enhancement_tpu.ops.pallas.conv_pool_cm import (
        conv3x3_pool_cm,
        deinterleave_cols,
    )
    from multi_degradation_image_enhancement_tpu.ops.pallas.dense_block_cm import _run_cm2

    model = CDAN(dtype=dtype)
    variables = model.init(
        {"params": jax.random.key(0)}, jnp.zeros((1, S, S, 3), jnp.float32), train=False
    )
    folded = cdan_fast._fold_all(variables)
    db_packed = cdan_fast._pack_dense_blocks(variables)
    from multi_degradation_image_enhancement_tpu.ops.pallas.conv_cm import pack_conv
    from multi_degradation_image_enhancement_tpu.ops.pallas.conv_pool_cm import pack_conv_pool

    conv1_pack = pack_conv_pool(*folded["conv1"])
    conv_packs = {
        n: pack_conv(*folded[n])
        for n in ("conv2", "conv3", "conv4", "de1", "de2", "de3", "de4")
    }
    params, stats = variables["params"], variables["batch_stats"]
    dec_p, dec_s = params["decoder"], stats["decoder"]
    cbam_packs = {
        "bottleneck": cdan_fast.pack_cbam_cm(params["bottleneck"], stats["bottleneck"]),
        "cbam1": cdan_fast.pack_cbam_cm(dec_p["cbam1"], dec_s["cbam1"]),
        "cbam2": cdan_fast.pack_cbam_cm(dec_p["cbam2"], dec_s["cbam2"]),
        "cbam3": cdan_fast.pack_cbam_cm(dec_p["cbam3"], dec_s["cbam3"]),
    }

    rng = np.random.RandomState(0)

    def arr(c, hw):
        return jnp.asarray(rng.rand(B, c, hw), np.float32).astype(dtype)

    h1, w1 = S, S
    h2, w2 = S // 2, S // 2
    h3, w3 = S // 4, S // 4
    h4, w4 = S // 8, S // 8

    def timed(name, fn, x):
        if only and name not in only:
            return
        jfn = jax.jit(fn)
        dt = forced_timeit(lambda i: jfn(x), args.iters)
        print(f"{name:34s} {dt*1e3:8.2f} ms", flush=True)

    x_in = arr(3, h1 * w1)
    x8 = jnp.pad(x_in, ((0, 0), (0, 5), (0, 0)))
    timed("deinterleave(8ch@256²)", lambda x: deinterleave_cols(x, (h1, w1)), x8)
    x_dei = deinterleave_cols(x8, (h1, w1))
    timed(
        "conv1+pool kernel",
        lambda x: conv3x3_pool_cm(x, conv1_pack, hw_shape=(h1, w1)),
        x_dei,
    )
    timed(
        "conv2 split=2 (64→128@128²)",
        lambda x: conv3x3_cm(x, conv_packs["conv2"], hw_shape=(h2, w2)),
        arr(64, h2 * w2),
    )
    timed(
        "conv3 (128→256@64²)",
        lambda x: conv3x3_cm(x, conv_packs["conv3"], hw_shape=(h3, w3)),
        arr(128, h3 * w3),
    )
    timed(
        "conv4 (256→512@32²)",
        lambda x: conv3x3_cm(x, conv_packs["conv4"], hw_shape=(h4, w4)),
        arr(256, h4 * w4),
    )
    timed(
        "de1 (512→256@32²)",
        lambda x: conv3x3_cm(x, conv_packs["de1"], hw_shape=(h4, w4)),
        arr(512, h4 * w4),
    )
    timed(
        "de2 (256→128@32²)",
        lambda x: conv3x3_cm(x, conv_packs["de2"], hw_shape=(h4, w4)),
        arr(256, h4 * w4),
    )
    timed(
        "de3 (128→64@64²)",
        lambda x: conv3x3_cm(x, conv_packs["de3"], hw_shape=(h3, w3)),
        arr(128, h3 * w3),
    )
    timed(
        "de4 (64→3@128²)",
        lambda x: conv3x3_cm(x, conv_packs["de4"], hw_shape=(h2, w2)),
        arr(64, h2 * w2),
    )
    for name, c, h, w in [
        ("db1 (64@128²)", 64, h2, w2),
        ("db2 (128@64²)", 128, h3, w3),
        ("db3 (256@32²)", 256, h4, w4),
        ("db_final (3@256²)", 3, h1, w1),
    ]:
        key = {"db1": "dense1", "db2": "dense2", "db3": "dense3", "db_final": "final_dense"}[
            name.split()[0]
        ]
        timed(
            name,
            lambda x, k=key, c=c, h=h, w=w: _run_cm2(
                x, db_packed[k], c_in=c, hw_shape=(h, w), interpret=False
            ),
            arr(c, h * w),
        )
    for name, c, h, w in [
        ("cbam bottleneck (512@32²)", 512, h4, w4),
        ("cbam1 (256@32²)", 256, h4, w4),
        ("cbam2 (128@64²)", 128, h3, w3),
        ("cbam3 (64@128²)", 64, h2, w2),
    ]:
        key = name.split()[0] if name.startswith("cbam") else "bottleneck"
        key = "bottleneck" if "bottleneck" in name else name.split()[0]
        timed(
            name,
            lambda x, k=key, h=h, w=w: cdan_fast._cbam_cm(x, cbam_packs[k], (h, w), dtype),
            arr(c, h * w),
        )
    timed(
        "pool2 (128ch 128²→64²)",
        lambda x: cdan_fast._maxpool2x2_cm(x, (h2, w2)),
        arr(128, h2 * w2),
    )
    timed(
        "pool3 (256ch 64²→32²)",
        lambda x: cdan_fast._maxpool2x2_cm(x, (h3, w3)),
        arr(256, h3 * w3),
    )
    timed(
        "ups de2 (128ch 32²→64²)",
        lambda x: cdan_fast._upsample_x2_cm(x, (h4, w4)),
        arr(128, h4 * w4),
    )
    timed(
        "ups de3 (64ch 64²→128²)",
        lambda x: cdan_fast._upsample_x2_cm(x, (h3, w3)),
        arr(64, h3 * w3),
    )
    timed(
        "ups de4 (3ch 128²→256²)",
        lambda x: cdan_fast._upsample_x2_cm(x, (h2, w2)),
        arr(3, h2 * w2),
    )
    timed(
        "in-transpose (NHWC→CM 256²)",
        lambda x: x.transpose(0, 3, 1, 2).reshape(B, 3, h1 * w1).astype(dtype),
        jnp.asarray(rng.rand(B, h1, w1, 3), np.float32),
    )
    timed(
        "out-transpose (CM→NHWC 256²)",
        lambda x: x.reshape(B, 3, h1, w1).transpose(0, 2, 3, 1).astype(jnp.float32),
        arr(3, h1 * w1),
    )


if __name__ == "__main__":
    main()
