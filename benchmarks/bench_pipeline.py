#!/usr/bin/env python
"""Full-pipeline throughput: classify → route (top-1 bank) → restore.

The headline bench (bench.py) measures the degrade→restore serving kernel;
this one measures the complete production story the reference only implies
(classifier + per-degradation checkpoints): ResNet18 2-head classifier,
9-expert stacked CDAN bank, capacity-factor top-1 dispatch — all in one
jitted step at the reference serving resolution (256×384).

Weights are random-initialized (shapes, not values, set the compute);
`run_pipeline.py` is the artifact-loading production entry.

Usage: python benchmarks/bench_pipeline.py [--batch 32] [--iters 20]
       [--hw 256 384] [--mode top1|sequential]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks.microbench import forced_timeit

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def capacity_drop_rate(
    expert_ids: np.ndarray, n_experts: int, batch: int, capacity_factor: float
) -> float:
    """Fraction of images the top1 dispatch passes through UNRESTORED because
    their expert's capacity bucket overflowed — mirrors the keep/position
    math of ``RoutedRestorer._build`` exactly (cumsum rank < capacity)."""
    capacity = max(1, int(math.ceil(batch / n_experts * capacity_factor)))
    dropped = 0
    counts = np.zeros(n_experts, np.int64)
    for e in expert_ids:
        if counts[e] >= capacity:
            dropped += 1
        counts[e] += 1
    return dropped / len(expert_ids)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--hw", type=int, nargs=2, default=[256, 384])
    ap.add_argument("--mode", choices=["top1", "sequential"], default="top1")
    ap.add_argument("--capacity-factor", type=float, default=2.0)
    ap.add_argument("--json-out", default=os.path.join(
        REPO, "tools", "parity", "results_r3", "pipeline_bench.json"))
    args = ap.parse_args()

    from multi_degradation_image_enhancement_tpu.classification.model import (
        MultiHeadClassifier,
    )
    from multi_degradation_image_enhancement_tpu.models.cdan import CDAN
    from multi_degradation_image_enhancement_tpu.ops.degradations import DEGRADATIONS
    from multi_degradation_image_enhancement_tpu.pipeline import (
        FullPipeline,
        RoutedRestorer,
        stack_expert_variables,
    )

    B, (H, W) = args.batch, args.hw
    dtype = jnp.bfloat16 if jax.default_backend() != "cpu" else jnp.float32
    names = list(DEGRADATIONS)

    clf = MultiHeadClassifier(num_classes=len(names), dtype=dtype)
    clf_vars = clf.init(
        {"params": jax.random.key(0)}, jnp.zeros((1, H, W, 3), jnp.float32), train=False
    )

    network = CDAN(dtype=dtype)
    one = network.init(
        {"params": jax.random.key(1)}, jnp.zeros((1, H, W, 3), jnp.float32), train=False
    )
    # 9 experts: same tree stacked (values don't affect wall-clock; routing
    # spreads the batch by argmax of an untrained classifier — representative
    # of mixed-degradation traffic).
    bank = stack_expert_variables([one] * len(names))
    router = RoutedRestorer(network, names, bank, mode=args.mode)
    pipe = FullPipeline(clf, clf_vars, router, thresholds=[0.5] * len(names))

    imgs = (
        jnp.abs(jnp.sin(jnp.arange(B * H * W * 3, dtype=jnp.float32) * 0.001))
        .reshape(B, H, W, 3)
    )

    restore_step = jax.jit(lambda x: pipe(x)[0])
    classify_step = jax.jit(pipe._classify)

    t_cls = forced_timeit(lambda i: classify_step(imgs + i * 1e-6), args.iters)
    t_all = forced_timeit(lambda i: restore_step(imgs + i * 1e-6), args.iters)
    print(f"classify alone : {t_cls*1e3:7.2f} ms  ({B/t_cls:,.0f} img/s)")
    print(f"full pipeline  : {t_all*1e3:7.2f} ms  ({B/t_all:,.0f} img/s)  "
          f"[mode={args.mode}, {len(names)} experts, {H}x{W}, B={B}]")

    # Capacity-drop rate on skewed traffic (VERDICT r4 item 5): top1's
    # capacity buckets overflow when traffic concentrates on few classes,
    # and overflowed images pass through unrestored.  Computed analytically
    # with the dispatch's own keep/position math at several skew levels
    # (fraction of the batch whose argmax lands on ONE expert, remainder
    # uniform over the rest).
    rng = np.random.RandomState(0)
    E = len(names)
    drops = {}
    for skew in (0.0, 0.3, 0.6, 0.9):
        n_hot = int(round(B * skew))
        ids = np.concatenate([
            np.zeros(n_hot, np.int64),
            rng.randint(1, E, B - n_hot),
        ])
        rng.shuffle(ids)
        drops[f"skew_{skew:.1f}"] = capacity_drop_rate(
            ids, E, B, args.capacity_factor)
    print("top1 capacity-drop rate (capacity_factor="
          f"{args.capacity_factor}): " + ", ".join(
              f"{k}={v:.3f}" for k, v in drops.items()))

    # chip-health context for the recorded numbers (healthy ≈107 TF/s)
    try:
        a = jnp.ones((4096, 4096), jnp.bfloat16)

        @jax.jit
        def _anchor(m):
            def body(c, _):
                return jnp.tanh(c @ m), None
            return jnp.mean(jax.lax.scan(body, m, None, length=20)[0])

        float(_anchor(a))
        import time as _time
        t0 = _time.perf_counter()
        float(_anchor(a))
        anchor_tflops = round(20 * 2 * 4096**3 / (_time.perf_counter() - t0) / 1e12, 1)
    except Exception:
        anchor_tflops = None

    row = {
        "mode": args.mode, "batch": B, "hw": [H, W], "n_experts": E,
        "iters": args.iters, "backend": jax.default_backend(),
        "chip_anchor_tflops": anchor_tflops,
        "classify_ms": t_cls * 1e3, "classify_img_s": B / t_cls,
        "pipeline_ms": t_all * 1e3, "pipeline_img_s": B / t_all,
        "capacity_factor": args.capacity_factor,
        "capacity_drop_rate_by_skew": drops,
    }
    out = {}
    if os.path.isfile(args.json_out):
        try:
            out = json.load(open(args.json_out))
        except (json.JSONDecodeError, OSError):
            out = {}
    out[f"{args.mode}_b{B}_{H}x{W}"] = row
    os.makedirs(os.path.dirname(args.json_out), exist_ok=True)
    with open(args.json_out, "w") as f:
        json.dump(out, f, indent=2)
    print(f"[bench_pipeline] -> {args.json_out}")


if __name__ == "__main__":
    main()
