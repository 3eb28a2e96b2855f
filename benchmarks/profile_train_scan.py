#!/usr/bin/env python
"""Training-step timing with the step loop ON DEVICE (``lax.scan``).

The host-loop profiler (``profile_train.py``) dispatches every step from
Python, so its numbers embed the tunnel's per-call RTT — healthy ~1.7 ms,
but observed degraded to ~120 ms (2026-08-19), which makes host-loop
training tables unmeasurable for hours at a time.  This variant chains
``N`` full train steps (on-device pair synthesis + fwd + loss + bwd + Adam
+ BN updates, exactly ``engine.model.make_train_step``) inside ONE jitted
``lax.scan`` and reads back a single scalar, so per-step time is pure
device work.

To remove the remaining once-per-call overhead exactly, each variant is
timed at two scan lengths and the per-step cost is the slope:

    t(n) = overhead + n * per_step   ->   per_step = (t(n2) - t(n1)) / (n2 - n1)

Methodology note for PERF.md: on a healthy tunnel this must agree with the
host-loop profiler (dispatch hides behind a 60+ ms step); record both when
possible.  The scan carry is the full TrainState, so memory behavior
matches single-step training (OOM probes remain meaningful).

Usage: python benchmarks/profile_train_scan.py [--batch 16] [--height 256]
       [--width 384] [--n1 5] [--n2 20] [--reps 3]
       [--only "fused,fused+remat"]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import optax


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--height", type=int, default=256)
    ap.add_argument("--width", type=int, default=384)
    ap.add_argument("--n1", type=int, default=5)
    ap.add_argument("--n2", type=int, default=20)
    ap.add_argument("--reps", type=int, default=3,
                    help="repetitions per length; min is reported")
    ap.add_argument("--only", type=str, default="",
                    help="comma-separated variant names (default: all)")
    ap.add_argument("--k-stack", type=int, default=0,
                    help="growth_train._K_STACK_MAX_CI for fused variants")
    args = ap.parse_args()
    B, H, W = args.batch, args.height, args.width
    only = [s.strip() for s in args.only.split(",") if s.strip()]

    if args.k_stack:
        from multi_degradation_image_enhancement_tpu.ops.pallas import growth_train
        growth_train._K_STACK_MAX_CI = args.k_stack
        print(f"[scan-profile] growth K-stack width = {args.k_stack}", flush=True)

    from multi_degradation_image_enhancement_tpu.engine.model import make_train_step
    from multi_degradation_image_enhancement_tpu.engine.state import TrainState
    from multi_degradation_image_enhancement_tpu.models.cdan import CDAN
    from multi_degradation_image_enhancement_tpu.ops.degradations import apply_degradation
    from multi_degradation_image_enhancement_tpu.ops.losses import build_loss_pipeline

    loss_pipe = build_loss_pipeline(
        {"terms": [
            {"name": "charbonnier", "weight": 1.0, "args": {"eps": 1e-3}},
            {"name": "ssim", "weight": 0.5},
        ]}
    )
    clean = (
        jnp.abs(jnp.sin(jnp.arange(B * H * W * 3, dtype=jnp.float32) * 0.001))
        .reshape(B, H, W, 3)
        * 255.0
    )
    key = jax.random.key(0)

    def build_state(model):
        variables = model.init(
            {"params": jax.random.key(0), "dropout": jax.random.key(1)},
            jnp.zeros((1, H, W, 3), jnp.float32),
            train=True,
        )
        return TrainState.create(
            params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            tx=optax.adam(1e-3),
        )

    def scanned(model, remat, n_steps):
        step = make_train_step(model, loss_pipe, remat=remat)

        @jax.jit
        def run(state, c, k):
            def body(st, i):
                ki = jax.random.fold_in(k, i)
                kd, ks = jax.random.split(ki)
                x = apply_degradation("noise", c, kd) / 255.0
                st2, loss = step(st, x, c / 255.0, ks)
                return st2, loss["total"]

            st, losses = jax.lax.scan(body, state, jnp.arange(n_steps))
            return st, jnp.mean(losses)

        return run

    def time_len(model, remat, n_steps):
        run = scanned(model, remat, n_steps)
        state = build_state(model)
        st, l = run(state, clean, key)          # compile + warm
        float(l)
        best = float("inf")
        for r in range(args.reps):
            t0 = time.perf_counter()
            st, l = run(st, clean, jax.random.fold_in(key, 100 + r))
            float(l)                            # forced completion
            best = min(best, time.perf_counter() - t0)
        return best

    variants = [
        ("plain", dict(), False),
        ("remat", dict(), True),
        ("fused", dict(fused_dense=True), False),
        ("fused+remat", dict(fused_dense=True), True),
    ]
    for name, mkw, remat in variants:
        if only and name not in only:
            continue
        try:
            model = CDAN(dtype=jnp.bfloat16, **mkw)
            t1 = time_len(model, remat, args.n1)
            t2 = time_len(model, remat, args.n2)
            per_step = (t2 - t1) / (args.n2 - args.n1)
            overhead = t1 - args.n1 * per_step
            print(
                f"{name:14s} {per_step*1e3:8.2f} ms/step  {B/per_step:7.0f} img/s"
                f"   (scan {args.n1}/{args.n2}: {t1*1e3:.0f}/{t2*1e3:.0f} ms,"
                f" fixed {overhead*1e3:.0f} ms)",
                flush=True,
            )
        except Exception as e:  # OOM at a probe shape is an answer, not a crash
            print(f"{name:14s} FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
