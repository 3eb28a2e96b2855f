#!/usr/bin/env python
"""Attribute train-step time to segments, scan-chained (tunnel-RTT immune).

Times nested prefixes of the full training step as ON-DEVICE ``lax.scan``
loops (two lengths, per-step cost = slope, like profile_train_scan.py) so
consecutive differences attribute the step budget:

    synth                  on-device degradation pair synthesis
    fwd_eval    - synth    eval-mode forward (running-stat BN, bf16 affine)
    fwd_train   - fwd_eval train-mode premium (f32 batch-stat BN + updates)
    fwd_loss    - fwd_train loss pipeline (charbonnier + SSIM)
    grad        - fwd_loss backward pass (value_and_grad)
    full        - grad     Adam update + BN-stat commit

The ``full`` row is exactly ``engine.model.make_train_step`` and must match
profile_train_scan.py's number for the same flags.

Usage: python benchmarks/profile_train_segments.py [--batch 16] [--height 256]
       [--width 384] [--fused] [--remat] [--k-stack N] [--n1 3] [--n2 10]
       [--reps 2] [--only synth,fwd_eval,...]
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
    ap.add_argument("--fused", action="store_true")
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--k-stack", type=int, default=0)
    ap.add_argument("--n1", type=int, default=3)
    ap.add_argument("--n2", type=int, default=10)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--only", type=str, default="")
    args = ap.parse_args()
    B, H, W = args.batch, args.height, args.width
    only = [s.strip() for s in args.only.split(",") if s.strip()]

    if args.k_stack:
        from multi_degradation_image_enhancement_tpu.ops.pallas import growth_train

        growth_train._K_STACK_MAX_CI = args.k_stack
        print(f"[segments] growth K-stack width = {args.k_stack}", flush=True)

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

    model = CDAN(dtype=jnp.bfloat16, fused_dense=args.fused)
    if args.remat:
        import dataclasses

        model = dataclasses.replace(model, remat=True)
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        jnp.zeros((1, H, W, 3), jnp.float32),
        train=True,
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    state = TrainState.create(
        params=params, batch_stats=batch_stats, tx=optax.adam(1e-3)
    )
    # make_train_step re-applies per-block remat itself; hand it the plain
    # module so the full row matches profile_train_scan exactly.
    base_model = CDAN(dtype=jnp.bfloat16, fused_dense=args.fused)
    full_step = make_train_step(base_model, loss_pipe, remat=args.remat)

    def synth(k):
        kd, ks = jax.random.split(k)
        return apply_degradation("noise", clean, kd) / 255.0, ks

    def body_synth(acc, k):
        x, _ = synth(k)
        return acc + jnp.mean(x), None

    def body_fwd_eval(acc, k):
        x, _ = synth(k)
        out = model.apply(
            {"params": params, "batch_stats": batch_stats}, x, train=False
        )
        return acc + jnp.mean(out.astype(jnp.float32)), None

    def fwd_train(bs, x, ks):
        out, mutated = model.apply(
            {"params": params, "batch_stats": bs},
            x,
            train=True,
            mutable=["batch_stats"],
            rngs={"dropout": ks},
        )
        return out, mutated["batch_stats"]

    def body_fwd_train(carry, k):
        acc, bs = carry
        x, ks = synth(k)
        out, bs = fwd_train(bs, x, ks)
        return (acc + jnp.mean(out.astype(jnp.float32)), bs), None

    def body_fwd_loss(carry, k):
        acc, bs = carry
        x, ks = synth(k)
        out, bs2 = fwd_train(bs, x, ks)
        loss = loss_pipe(
            out, targets=clean / 255.0, inputs=x, is_paired=True, mask=None
        )["total"]
        return (acc + loss, bs2), None

    def body_grad(carry, k):
        acc, bs = carry
        x, ks = synth(k)

        def loss_fn(p):
            out, mutated = model.apply(
                {"params": p, "batch_stats": bs},
                x,
                train=True,
                mutable=["batch_stats"],
                rngs={"dropout": ks},
            )
            loss = loss_pipe(
                out, targets=clean / 255.0, inputs=x, is_paired=True, mask=None
            )["total"]
            return loss, mutated["batch_stats"]

        (loss, bs2), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        gsum = sum(
            jnp.sum(g.astype(jnp.float32)) for g in jax.tree.leaves(grads)
        )
        # 1e-30 (not 0.0) so no constant-folding pass can drop the grads.
        return (acc + loss + 1e-30 * gsum, bs2), None

    def body_full(st, k):
        x, ks = synth(k)
        st2, loss = full_step(st, x, clean / 255.0, ks)
        return st2, loss["total"]

    def run_scan(body, carry0, n, scalar_of_carry):
        @jax.jit
        def run(c0, k):
            c, _ = jax.lax.scan(
                body, c0, jax.random.split(k, n)
            )
            return c

        c = run(carry0, key)  # compile + warm
        float(scalar_of_carry(c))
        best = float("inf")
        for r in range(args.reps):
            t0 = time.perf_counter()
            c = run(carry0, jax.random.fold_in(key, 100 + r))
            float(scalar_of_carry(c))
            best = min(best, time.perf_counter() - t0)
        return best

    zero = jnp.zeros(())
    segments = [
        ("synth", body_synth, zero, lambda c: c),
        ("fwd_eval", body_fwd_eval, zero, lambda c: c),
        ("fwd_train", body_fwd_train, (zero, batch_stats), lambda c: c[0]),
        ("fwd_loss", body_fwd_loss, (zero, batch_stats), lambda c: c[0]),
        ("grad", body_grad, (zero, batch_stats), lambda c: c[0]),
        ("full", body_full, state, lambda st: st.step),
    ]
    prev = 0.0
    print(
        f"[segments] b{B} {H}x{W} fused={args.fused} remat={args.remat}"
        f" (per-step = slope over scan {args.n1}->{args.n2})",
        flush=True,
    )
    for name, body, carry0, scalar in segments:
        if only and name not in only:
            continue
        try:
            t1 = run_scan(body, carry0, args.n1, scalar)
            t2 = run_scan(body, carry0, args.n2, scalar)
            per_step = (t2 - t1) / (args.n2 - args.n1)
            delta = per_step - prev
            print(
                f"{name:10s} {per_step*1e3:8.2f} ms/step   (+{delta*1e3:7.2f} ms)",
                flush=True,
            )
            prev = per_step
        except Exception as e:
            print(f"{name:10s} FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
