#!/usr/bin/env python
"""Training throughput table at the reference recipe shape (VERDICT r4 item 6).

Measures sustained optimizer-steps-per-second of the REAL training path —
``engine.model.make_train_step`` (fwd + charbonnier+SSIM loss + bwd + Adam
+ BN updates) chained device-side through ``lax.scan`` exactly like the
engine's ``train.scan_chunk`` mode — on synthetic on-device pairs, so the
number is pure device time at the production 256×384 shape.

Rows: batch ∈ {16, 32, 64} × {plain, fused_dense, remat} as applicable.
b64 without remat is a known compile-time HBM OOM (PERF.md round 3);
recorded as such rather than skipped silently.  Data parallelism note: on
this 1-chip host the mesh path only adds partitioning overhead at
{data:1}; its SPMD semantics (scan×mesh composition, DP equality) are
CPU-8-device tested (tests/test_engine.py::test_scan_chunk_composes_with_mesh,
tests/test_parallel.py).

Usage: python benchmarks/train_throughput.py [--iters 3] [--chunk 8]
       [--rows b16,b16_fused,b32,b64_remat] [--json-out ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import optax

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ROWS = {
    # name: (batch, fused_dense, remat)
    "b16": (16, False, False),
    "b16_fused": (16, True, False),
    "b32": (32, False, False),
    "b32_fused": (32, True, False),
    "b64": (64, False, False),
    "b64_remat": (64, False, True),
}


def measure(batch: int, fused: bool, remat: bool, chunk: int, iters: int,
            hw=(256, 384)) -> dict:
    from multi_degradation_image_enhancement_tpu.engine.model import make_train_step
    from multi_degradation_image_enhancement_tpu.engine.state import TrainState
    from multi_degradation_image_enhancement_tpu.models.cdan import CDAN
    from multi_degradation_image_enhancement_tpu.ops.degradations import degrade_batch
    from multi_degradation_image_enhancement_tpu.ops.losses import build_loss_pipeline

    H, W = hw
    dtype = jnp.bfloat16 if jax.default_backend() != "cpu" else jnp.float32
    model = CDAN(dtype=dtype, fused_dense=fused)
    clean = jnp.linspace(
        0.0, 255.0, batch * H * W * 3, dtype=jnp.float32
    ).reshape(batch, H, W, 3)
    degraded01, clean01 = degrade_batch(clean, "noise", jax.random.key(7))

    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        jnp.zeros((1, H, W, 3), jnp.float32), train=True,
    )
    state = TrainState.create(
        params=variables["params"], batch_stats=variables["batch_stats"],
        tx=optax.adam(1e-3),
    )
    loss_pipe = build_loss_pipeline({"enabled": True, "terms": [
        {"name": "charbonnier", "weight": 1.0, "args": {"eps": 1e-3}},
        {"name": "ssim", "weight": 0.5},
    ]})
    step = make_train_step(model, loss_pipe, remat=remat)

    def chunk_fn(st, keys):
        def body(s, k):
            new_s, ld = step(s, degraded01, clean01, k)
            return new_s, ld["total"]
        return jax.lax.scan(body, st, keys)

    chunk_jit = jax.jit(chunk_fn, donate_argnums=(0,))
    keys = jax.random.split(jax.random.key(2), chunk)

    state, totals = chunk_jit(state, keys)  # compile + warm
    float(totals[-1])
    best = 1e9
    for _ in range(iters):
        t0 = time.perf_counter()
        state, totals = chunk_jit(state, keys)
        float(totals[-1])  # host readback closes the timer honestly
        best = min(best, time.perf_counter() - t0)
    img_s = batch * chunk / best
    return {
        "batch": batch, "fused_dense": fused, "remat": remat,
        "hw": list(hw), "chunk": chunk, "step_ms": best / chunk * 1e3, "img_s": img_s,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--chunk", type=int, default=8)
    ap.add_argument("--rows", default="b16,b16_fused,b32,b64_remat")
    ap.add_argument("--hw", type=int, nargs=2, default=[256, 384])
    ap.add_argument("--json-out", default=os.path.join(
        REPO, "tools", "parity", "results_r3", "train_throughput.json"))
    args = ap.parse_args()

    out = {}
    if os.path.isfile(args.json_out):
        try:
            out = json.load(open(args.json_out))
        except (json.JSONDecodeError, OSError):
            out = {}
    out.setdefault("backend", jax.default_backend())
    for name in [r for r in args.rows.split(",") if r]:
        batch, fused, remat = ROWS[name]
        print(f"[train_tp] {name}: b{batch} fused={fused} remat={remat} ...",
              flush=True)
        try:
            row = measure(batch, fused, remat, args.chunk, args.iters,
                          hw=tuple(args.hw))
            print(f"[train_tp] {name}: {row['img_s']:.1f} img/s "
                  f"({row['step_ms']:.1f} ms/step)", flush=True)
        except Exception as e:  # compile-OOM rows are data, not crashes
            row = {"batch": batch, "fused_dense": fused, "remat": remat,
                   "error": str(e)[:300]}
            print(f"[train_tp] {name}: FAILED {str(e)[:160]}", flush=True)
        out[name] = row
        with open(args.json_out, "w") as f:
            json.dump(out, f, indent=2)
    print(f"[train_tp] -> {args.json_out}")


if __name__ == "__main__":
    main()
