#!/usr/bin/env python
"""XLA flag sweep over the serving step — the one untried serving axis.

Every prior serving lever was code-level (kernels, layouts, PRNG); XLA's
own TPU backend knobs (scoped-VMEM fusion headroom, reduce-window fusion,
scheduler) were never swept.  Flags are process-global, so each variant
re-runs this script as a subprocess with ``XLA_FLAGS`` set and times the
tuned serving step (bench.time_pipeline: forced execution, chained
readback).  Variants that fail to parse (unknown flag on this jaxlib) are
reported as such rather than crashing the sweep.

Usage:  python benchmarks/exp_xla_flags.py            # full sweep (serialized)
        python benchmarks/exp_xla_flags.py --single   # one timing in-process
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

VARIANTS = [
    ("baseline", ""),
    ("vmem64m", "--xla_tpu_scoped_vmem_limit_kib=65536"),
    ("vmem96m", "--xla_tpu_scoped_vmem_limit_kib=98304"),
    ("no_rwb_fusion", "--xla_tpu_rwb_fusion=false"),
    ("licm2", "--xla_tpu_licm_size_inflation_ratio=2"),
    ("async_done_sched", "--xla_tpu_enable_latency_hiding_scheduler=true"),
    (
        "vmem64m+no_rwb",
        "--xla_tpu_scoped_vmem_limit_kib=65536 --xla_tpu_rwb_fusion=false",
    ),
]


def run_single(batch: int, size: int, iters: int) -> None:
    import jax.numpy as jnp

    from bench import time_pipeline

    rate = time_pipeline(batch, size, jnp.bfloat16, iters)
    print(json.dumps({"img_per_s": round(rate, 1)}))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--single", action="store_true")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    if args.single:
        run_single(args.batch, args.size, args.iters)
        return

    results = []
    for name, flags in VARIANTS:
        env = dict(os.environ)
        base = env.get("XLA_FLAGS", "")
        env["XLA_FLAGS"] = f"{base} {flags}".strip()
        # fresh compiles per flag set — flags change the executable
        env["JAX_COMPILATION_CACHE_DIR"] = f"/tmp/jaxcache_flags_{name}"
        res = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--single",
             "--batch", str(args.batch), "--size", str(args.size),
             "--iters", str(args.iters)],
            env=env, capture_output=True, text=True, timeout=2400, cwd=REPO,
        )
        line = res.stdout.strip().splitlines()[-1] if res.stdout.strip() else ""
        try:
            rate = json.loads(line)["img_per_s"]
            results.append((name, flags, rate))
            print(f"{name:20s} {rate:8.1f} img/s   [{flags}]", flush=True)
        except Exception:
            print(f"{name:20s}   FAILED: {res.stderr.strip().splitlines()[-1][:160] if res.stderr.strip() else 'no output'}",
                  flush=True)

    if results:
        base = dict((n, r) for n, _, r in results).get("baseline")
        best = max(results, key=lambda t: t[2])
        print(f"\nbest: {best[0]} at {best[2]:.1f} img/s"
              + (f" ({best[2] - base:+.1f} vs baseline)" if base else ""))


if __name__ == "__main__":
    main()
