#!/usr/bin/env python
"""Training-step profile at the reference recipe shape (b16 256×384).

Times the full jitted train step (on-device pair synthesis + fwd + loss +
bwd + Adam + BN updates) and ablations, to locate where the 124 ms/step of
round 2 lives before deciding on a trainable-kernel design (VERDICT r2
item 2).  Forced-execution timing (PERF.md).

Usage: python benchmarks/profile_train.py [--batch 16] [--height 256] [--width 384]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import optax

from benchmarks.microbench import forced_timeit


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--height", type=int, default=256)
    ap.add_argument("--width", type=int, default=384)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--only", type=str, default="")
    ap.add_argument("--k-stack", type=int, default=0,
                    help="growth_train._K_STACK_MAX_CI for the fused variants")
    args = ap.parse_args()
    B, H, W = args.batch, args.height, args.width
    only = [s for s in args.only.split(",") if s]

    if args.k_stack:
        from multi_degradation_image_enhancement_tpu.ops.pallas import growth_train
        growth_train._K_STACK_MAX_CI = args.k_stack
        print(f"[profile_train] growth K-stack width = {args.k_stack}", flush=True)

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
        jnp.abs(jnp.sin(jnp.arange(B * H * W * 3, dtype=jnp.float32) * 0.001)).reshape(
            B, H, W, 3
        )
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

    def timed(name, fn, *xs):
        if only and name not in only:
            return
        dt = forced_timeit(fn, args.iters)
        print(
            f"{name:34s} {dt*1e3:8.2f} ms   {B/dt:7.0f} img/s", flush=True
        )

    model = CDAN(dtype=jnp.bfloat16)
    state = build_state(model)

    # degrade only
    deg = jax.jit(lambda c, k: apply_degradation("noise", c, k) / 255.0)
    timed("degrade+norm", lambda i: deg(clean, jax.random.fold_in(key, i)))

    # forward only (train mode, batch stats mutable)
    @jax.jit
    def fwd(params, bs, x, k):
        out, _ = model.apply(
            {"params": params, "batch_stats": bs}, x, train=True,
            mutable=["batch_stats"], rngs={"dropout": k},
        )
        return out

    x01 = deg(clean, key)
    timed(
        "forward (train mode)",
        lambda i: fwd(state.params, state.batch_stats, x01, jax.random.fold_in(key, i)),
    )

    # forward inference-mode (no stats, no dropout) for comparison
    @jax.jit
    def fwd_eval(params, bs, x):
        return model.apply({"params": params, "batch_stats": bs}, x, train=False)

    timed("forward (eval mode)", lambda i: fwd_eval(state.params, state.batch_stats, x01))

    # loss only on fixed tensors
    loss_j = jax.jit(lambda o, t: loss_pipe(o, targets=t, inputs=None)["total"])
    timed("loss only", lambda i: loss_j(x01, x01) + 0 * i)

    # full train step (incl. on-device synthesis)
    step = jax.jit(make_train_step(model, loss_pipe), donate_argnums=())

    def full(i):
        k = jax.random.fold_in(key, i)
        x = apply_degradation("noise", clean, k) / 255.0
        return x

    @jax.jit
    def train_full(state, c, k):
        kd, ks = jax.random.split(k)
        x = apply_degradation("noise", c, kd) / 255.0
        c01 = c / 255.0
        new_state, loss = make_train_step(model, loss_pipe)(state, x, c01, ks)
        return new_state, loss["total"]

    st = state

    def run_full(i):
        nonlocal st
        st, l = train_full(st, clean, jax.random.fold_in(key, i))
        return l

    timed("train step (fwd+bwd+adam+synth)", run_full)

    # remat variant
    model_r = CDAN(dtype=jnp.bfloat16, remat=True)
    state_r = build_state(model_r)

    @jax.jit
    def train_remat(state, c, k):
        kd, ks = jax.random.split(k)
        x = apply_degradation("noise", c, kd) / 255.0
        new_state, loss = make_train_step(model_r, loss_pipe)(state, x, c / 255.0, ks)
        return new_state, loss["total"]

    st_r = state_r

    def run_remat(i):
        nonlocal st_r
        st_r, l = train_remat(st_r, clean, jax.random.fold_in(key, i))
        return l

    timed("train step (per-block remat)", run_remat)

    # fused-DenseBlock variant (trainable Pallas growth kernel, custom VJP)
    model_f = CDAN(dtype=jnp.bfloat16, fused_dense=True)
    state_f = build_state(model_f)

    @jax.jit
    def fwd_f(params, bs, x, k):
        out, _ = model_f.apply(
            {"params": params, "batch_stats": bs}, x, train=True,
            mutable=["batch_stats"], rngs={"dropout": k},
        )
        return out

    timed(
        "forward fused (train mode)",
        lambda i: fwd_f(
            state_f.params, state_f.batch_stats, x01, jax.random.fold_in(key, i)
        ),
    )

    @jax.jit
    def train_fused(state, c, k):
        kd, ks = jax.random.split(k)
        x = apply_degradation("noise", c, kd) / 255.0
        new_state, loss = make_train_step(model_f, loss_pipe)(state, x, c / 255.0, ks)
        return new_state, loss["total"]

    st_f = state_f

    def run_fused(i):
        nonlocal st_f
        st_f, l = train_fused(st_f, clean, jax.random.fold_in(key, i))
        return l

    timed("train step (fused DenseBlocks)", run_fused)

    # fused + per-block remat (memory headroom probe for large batches)
    model_fr = CDAN(dtype=jnp.bfloat16, fused_dense=True, remat=True)
    state_fr = build_state(model_fr)

    @jax.jit
    def train_fused_r(state, c, k):
        kd, ks = jax.random.split(k)
        x = apply_degradation("noise", c, kd) / 255.0
        new_state, loss = make_train_step(model_fr, loss_pipe)(state, x, c / 255.0, ks)
        return new_state, loss["total"]

    st_fr = state_fr

    def run_fused_r(i):
        nonlocal st_fr
        st_fr, l = train_fused_r(st_fr, clean, jax.random.fold_in(key, i))
        return l

    timed("train step (fused + remat)", run_fused_r)


if __name__ == "__main__":
    main()
