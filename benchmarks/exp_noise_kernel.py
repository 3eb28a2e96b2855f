#!/usr/bin/env python
"""A/B: noise degrade stage — XLA PRNG (threefry / rbg) vs the fused Pallas
hardware-PRNG kernel (ops/pallas/noise.py).

Measures (forced execution, serialized):
  1. the degrade stage alone:  threefry | rbg | fused-kernel
  2. the full bench step (degrade → serving forward) with each degrade path

plus a moment sanity check of the fused kernel on-device (per-image noise σ
within 5% of the requested value).  ``--persist`` writes the winner to
``config/serving_tuning.json`` (``fused_noise`` key + provenance entry) when
the fused path wins end-to-end and passes sanity.

Usage: python benchmarks/exp_noise_kernel.py [--batch 128] [--size 256]
       [--iters 20] [--persist]
"""

from __future__ import annotations

import argparse
import json
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
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--persist", action="store_true")
    args = ap.parse_args()

    from multi_degradation_image_enhancement_tpu.models.cdan import CDAN
    from multi_degradation_image_enhancement_tpu.models.cdan_fast import build_serving_apply
    from multi_degradation_image_enhancement_tpu.ops.degradations import apply_degradation
    from multi_degradation_image_enhancement_tpu.ops.pallas.noise import (
        degrade_noise_batch_fast,
        noise_degrade_01,
        seed_from_key,
    )

    B, S = args.batch, args.size
    clean = (
        jnp.abs(jnp.sin(jnp.arange(B * S * S * 3, dtype=jnp.float32) * 0.001))
        .reshape(B, S, S, 3)
        * 255.0
    )

    # ---- sanity: fused kernel noise moments on-device ----
    std = jnp.full((B,), 30.0)
    flat = jnp.full((B, S, S, 3), 128.0)
    out = np.asarray(noise_degrade_01(flat, std, jnp.int32(7), scale=1.0))
    per_img_std = (out - 128.0).std(axis=(1, 2, 3))
    sane = bool(np.all(np.abs(per_img_std - 30.0) / 30.0 < 0.05))
    print(f"fused kernel sanity: per-image σ in [{per_img_std.min():.2f}, "
          f"{per_img_std.max():.2f}] (want 30 ± 5%) -> {'OK' if sane else 'FAIL'}")

    results = {}

    # ---- stage alone ----
    for impl in ("threefry2x32", "rbg"):
        key = jax.random.key(0, impl=impl)
        deg = jax.jit(lambda c, k: apply_degradation("noise", c, k) / 255.0)
        t = forced_timeit(lambda i: deg(clean, jax.random.fold_in(key, i)), args.iters)
        results[f"stage_{impl}"] = t * 1e3
        print(f"degrade stage  {impl:12s}: {t*1e3:6.2f} ms")

    key = jax.random.key(0)
    fused_stage = jax.jit(lambda c, k: degrade_noise_batch_fast(c, k)[0])
    t = forced_timeit(lambda i: fused_stage(clean, jax.random.fold_in(key, i)), args.iters)
    results["stage_fused"] = t * 1e3
    print(f"degrade stage  {'fused':12s}: {t*1e3:6.2f} ms")

    # ---- end-to-end bench step ----
    dtype = jnp.bfloat16 if jax.default_backend() != "cpu" else jnp.float32
    model = CDAN(dtype=dtype)
    variables = model.init(
        {"params": jax.random.key(0)}, jnp.zeros((1, S, S, 3), jnp.float32), train=False
    )
    forward = build_serving_apply(variables, dtype)

    key_rbg = jax.random.key(0, impl="rbg")
    e2e_rbg = jax.jit(lambda c, k: forward(apply_degradation("noise", c, k) / 255.0))
    t = forced_timeit(lambda i: e2e_rbg(clean, jax.random.fold_in(key_rbg, i)), args.iters)
    results["e2e_rbg"] = t * 1e3
    print(f"end-to-end     {'rbg':12s}: {t*1e3:6.2f} ms  ({B/t:,.0f} img/s)")

    e2e_fused = jax.jit(lambda c, k: forward(degrade_noise_batch_fast(c, k)[0]))
    t = forced_timeit(lambda i: e2e_fused(clean, jax.random.fold_in(key, i)), args.iters)
    results["e2e_fused"] = t * 1e3
    print(f"end-to-end     {'fused':12s}: {t*1e3:6.2f} ms  ({B/t:,.0f} img/s)")

    # bf16 kernel output = the forward's own input cast done in-kernel
    # (identical rounding), at half the degrade-write + conv1-read bytes.
    e2e_fused16 = jax.jit(
        lambda c, k: forward(degrade_noise_batch_fast(c, k, out_dtype=dtype)[0])
    )
    t = forced_timeit(lambda i: e2e_fused16(clean, jax.random.fold_in(key, i)), args.iters)
    results["e2e_fused_bf16"] = t * 1e3
    print(f"end-to-end     {'fused_bf16':12s}: {t*1e3:6.2f} ms  ({B/t:,.0f} img/s)")

    win = sane and min(results["e2e_fused"], results["e2e_fused_bf16"]) < results["e2e_rbg"]
    best_bf16 = results["e2e_fused_bf16"] < results["e2e_fused"]
    print(f"fused end-to-end delta: {results['e2e_rbg'] - results['e2e_fused']:+.2f} ms "
          f"-> {'WIN' if win else 'no win'}")

    if args.persist:
        path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "multi_degradation_image_enhancement_tpu", "config", "serving_tuning.json",
        )
        with open(path) as f:
            cfg = json.load(f)
        cfg["fused_noise"] = bool(win)
        cfg["fused_noise_bf16"] = bool(win and best_bf16)
        cfg.setdefault("provenance", {})["fused_noise"] = {
            "script": "benchmarks/exp_noise_kernel.py",
            "batch": B, "size": S, "iters": args.iters,
            "sane": sane, "results_ms": {k: round(v, 3) for k, v in results.items()},
        }
        with open(path, "w") as f:
            json.dump(cfg, f, indent=2)
        print(f"persisted fused_noise={win} -> {path}")


if __name__ == "__main__":
    main()
