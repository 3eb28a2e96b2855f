#!/usr/bin/env python
"""Component microbenchmarks with forced-execution timing.

``block_until_ready`` is unreliable on the axon-tunneled TPU backend (it
can return before execution finishes), so every measurement here chains the
op's output into a device accumulator and closes the timer over a host
readback — nothing can be elided or outrun the clock.

Usage:
  python benchmarks/microbench.py [--batch 128] [--size 256] [--iters 20] \
      [--which fwd train degrade ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from typing import Callable

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def forced_timeit(step: Callable[[int], jax.Array], iters: int = 20) -> float:
    """Time ``step(i)`` over ``iters`` with forced completion; returns sec/iter.

    ``step`` must return an array; its mean is chained into an accumulator
    whose final value is read back to host.
    """
    reduce_mean = jax.jit(lambda acc, out: acc + jnp.mean(out))
    acc = reduce_mean(jnp.zeros(()), step(0))
    float(acc)  # compile + warm
    t0 = time.perf_counter()
    acc = jnp.zeros(())
    for i in range(iters):
        acc = reduce_mean(acc, step(i))
    float(acc)
    return (time.perf_counter() - t0) / iters


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--remat", action="store_true", help="rematerialized train step")
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument(
        "--which", nargs="+",
        default=["fwd", "train", "degrade", "jpeg", "denseblock"],
    )
    args = ap.parse_args()
    B, S = args.batch, args.size

    from multi_degradation_image_enhancement_tpu.models.cdan import CDAN, DenseBlock
    from multi_degradation_image_enhancement_tpu.ops.degradations import apply_degradation

    dtype = jnp.bfloat16 if jax.default_backend() != "cpu" else jnp.float32
    key = jax.random.key(0)
    clean = jax.random.uniform(key, (B, S, S, 3), jnp.float32) * 255.0
    x01 = clean / 255.0
    results = {}

    if "fwd" in args.which:
        model = CDAN(dtype=dtype)
        v = model.init({"params": jax.random.key(0)}, x01[:1], train=False)
        fwd = jax.jit(lambda z: model.apply(v, z, train=False))
        dt = forced_timeit(lambda i: fwd(x01), args.iters)
        results["cdan_fwd_ms"] = dt * 1e3
        results["cdan_fwd_img_s"] = B / dt
        print(f"cdan fwd: {dt*1e3:.2f} ms  ({B/dt:.0f} img/s)", flush=True)

    if "train" in args.which:
        import optax

        from multi_degradation_image_enhancement_tpu.engine.model import make_train_step
        from multi_degradation_image_enhancement_tpu.engine.state import TrainState
        from multi_degradation_image_enhancement_tpu.ops.losses import build_loss_pipeline

        model = CDAN(dtype=dtype)
        variables = model.init(
            {"params": jax.random.key(0), "dropout": jax.random.key(1)}, x01[:1], train=True
        )
        state = TrainState.create(
            params=variables["params"], batch_stats=variables["batch_stats"],
            tx=optax.adam(1e-3),
        )
        loss_pipe = build_loss_pipeline(
            {"enabled": True, "terms": [
                {"name": "charbonnier", "weight": 1.0, "args": {"eps": 1e-3}},
                {"name": "ssim", "weight": 0.5},
            ]}
        )
        step = jax.jit(make_train_step(model, loss_pipe, remat=args.remat))
        deg01 = apply_degradation("noise", clean, key) / 255.0

        holder = {"state": state}

        def train_one(i):
            new_state, loss = step(holder["state"], deg01, x01, jax.random.fold_in(key, i))
            holder["state"] = new_state
            return loss["total"]

        dt = forced_timeit(train_one, max(4, args.iters // 2))
        results["train_step_ms"] = dt * 1e3
        results["train_img_s"] = B / dt
        print(f"train step: {dt*1e3:.2f} ms  ({B/dt:.0f} img/s)", flush=True)

    if "degrade" in args.which:
        for name in ("noise", "blur", "motion_blur", "pixelation"):
            f = jax.jit(lambda z, k, _n=name: apply_degradation(_n, z, k))
            dt = forced_timeit(lambda i: f(clean, jax.random.fold_in(key, i)), args.iters)
            results[f"degrade_{name}_ms"] = dt * 1e3
            print(f"degrade {name}: {dt*1e3:.2f} ms", flush=True)

    if "jpeg" in args.which:
        f = jax.jit(lambda z, k: apply_degradation("jpeg", z, k))
        dt = forced_timeit(lambda i: f(clean, jax.random.fold_in(key, i)), args.iters)
        results["degrade_jpeg_ms"] = dt * 1e3
        print(f"degrade jpeg: {dt*1e3:.2f} ms", flush=True)

    if "denseblock" in args.which:
        from flax import linen as nn

        class OneDB(nn.Module):
            feat: int

            @nn.compact
            def __call__(self, z, *, train=False):
                return DenseBlock(self.feat, dtype=dtype)(z, train=train)

        for feat, h in [(64, S // 2), (3, S)]:
            z = jax.random.uniform(jax.random.key(1), (B, h, h, feat), jnp.float32).astype(dtype)
            m = OneDB(feat)
            v = m.init({"params": jax.random.key(0)}, z[:1], train=False)
            f = jax.jit(lambda q, _m=m, _v=v: _m.apply(_v, q, train=False))
            dt = forced_timeit(lambda i: f(z), args.iters)
            results[f"denseblock_{feat}_at{h}_ms"] = dt * 1e3
            print(f"DenseBlock({feat}) @{h}: {dt*1e3:.2f} ms", flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
