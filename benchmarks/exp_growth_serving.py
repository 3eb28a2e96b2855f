#!/usr/bin/env python
"""Growth-rate variant serving probe: does widening the DenseBlock growth
convs (the structural 1/8-MXU bottleneck at growth 16 — PERF.md roofline)
ride the MXU well enough that capacity scales faster than wall-clock?

Times the plain-XLA CDAN forward (train=False) at growth 16 vs 64 on the
real chip, B=64·256², bf16, forced-execution timing.  growth 64 has 8x
the growth-conv FLOPs; if its step time grows by much less than 8x the
MXU-fill hypothesis holds and the wide variant is a favorable
quality-per-wall-clock opt-in.  Writes results_r3/growth_serving.json.
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from benchmarks.microbench import forced_timeit

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    from multi_degradation_image_enhancement_tpu.models.cdan import CDAN

    B, H, W = 64, 256, 256
    dtype = jnp.bfloat16 if jax.default_backend() != "cpu" else jnp.float32
    x = jnp.abs(jnp.sin(jnp.arange(B * H * W * 3, dtype=jnp.float32) * 1e-3)).reshape(
        B, H, W, 3)
    out = {"batch": B, "hw": [H, W], "backend": jax.default_backend()}
    for g in (16, 64):
        model = CDAN(dtype=dtype, growth_rate=g)
        v = model.init({"params": jax.random.key(0)}, x[:1], train=False)
        n_params = sum(p.size for p in jax.tree.leaves(v["params"]))
        fwd = jax.jit(lambda im, v=v, model=model: model.apply(v, im, train=False))
        t = forced_timeit(lambda i: fwd(x + i * 1e-6), 10)
        out[f"growth{g}"] = {
            "params": int(n_params), "ms_batch": t * 1e3, "img_s": B / t,
        }
        print(f"growth {g}: {n_params:,} params, {t*1e3:.1f} ms/batch, "
              f"{B/t:,.0f} img/s", flush=True)
    r16, r64 = out["growth16"], out["growth64"]
    out["time_ratio_64_over_16"] = r64["ms_batch"] / r16["ms_batch"]
    out["flop_ratio_growth_convs"] = 8.0
    path = os.path.join(REPO, "tools", "parity", "results_r3", "growth_serving.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(f"-> {path}")


if __name__ == "__main__":
    main()
