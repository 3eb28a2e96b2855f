#!/usr/bin/env python
"""Quick chip-health probe: compute anchor (TF/s) + dispatch RTT (ms).

Same measurements as bench.py's health probe (chained 4096³ bf16 matmuls
for compute — healthy ≈107 TF/s on this v5e; a tiny scalar round-trip for
dispatch — healthy ≈1.7 ms), as a standalone 30-second tool so watchdog
queues can gate the headline bench run on a healthy window
(VERDICT r4 item 2: "queue bench re-runs gated on the anchor ≥95 TF/s").

Prints one JSON line; exit code 0 iff anchor ≥ --min-tflops.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--min-tflops", type=float, default=95.0)
    args = ap.parse_args()

    x = jnp.zeros(())
    t_rtt = 1e9
    for _ in range(5):
        t0 = time.perf_counter()
        float(x + 1.0)
        t_rtt = min(t_rtt, time.perf_counter() - t0)

    a = jnp.ones((4096, 4096), jnp.bfloat16)

    @jax.jit
    def big(m):
        def body(c, _):
            return jnp.tanh(c @ m), None
        c, _ = jax.lax.scan(body, m, None, length=20)
        return jnp.mean(c)

    float(big(a))  # warm/compile
    t0 = time.perf_counter()
    float(big(a))
    tflops = 20 * 2 * 4096**3 / (time.perf_counter() - t0) / 1e12

    healthy = tflops >= args.min_tflops
    print(json.dumps({
        "anchor_tflops": round(tflops, 1),
        "dispatch_rtt_ms": round(t_rtt * 1e3, 2),
        "healthy": healthy,
        "min_tflops": args.min_tflops,
    }))
    sys.exit(0 if healthy else 1)


if __name__ == "__main__":
    main()
