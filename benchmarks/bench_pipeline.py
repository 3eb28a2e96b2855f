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
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from benchmarks.microbench import forced_timeit


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--hw", type=int, nargs=2, default=[256, 384])
    ap.add_argument("--mode", choices=["top1", "sequential"], default="top1")
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


if __name__ == "__main__":
    main()
