#!/usr/bin/env python
"""Re-probe int8 matmul throughput through Mosaic vs bf16 (PERF.md receipt).

Round 2 measured int8 dot_general at 0.66× bf16 (40.6 vs 61.6 T/s on a
32-block [1536,512]×[512,2048] grid) — the v5e int8 fast path is not
reachable from Pallas on that toolchain, which rejects a quantized serving
mode.  VERDICT r2 asks that this receipt be re-probed on the current
toolchain before the ≥5k img/s analysis leans on it.

Usage: python benchmarks/exp_int8_reprobe.py [--iters 20]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from benchmarks.microbench import forced_timeit

M, K, N, BLOCKS = 1536, 512, 2048, 32


# The 2026-08 toolchain double-buffers pallas out blocks: a [1, M, N] i32
# block (12.6 MB) blows the 16 MB scoped-vmem limit that the round-2
# toolchain accepted.  N is therefore split across the grid so every
# buffer fits with double-buffering (out block [1, M, N_BLOCK] ≤ 3.1 MB).
N_BLOCK = 512


def _mm_kernel(a_ref, b_ref, o_ref, *, acc_dtype):
    # refs carry the leading grid-block dim: [1, M, K] / [1, K, N_BLOCK]
    o_ref[0] = jax.lax.dot_general(
        a_ref[0],
        b_ref[0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=acc_dtype,
    ).astype(o_ref.dtype)


def build(dtype, acc_dtype, out_dtype):
    a = jnp.ones((BLOCKS, M, K), dtype)
    b = jnp.ones((BLOCKS, K, N), dtype)
    call = pl.pallas_call(
        functools.partial(_mm_kernel, acc_dtype=acc_dtype),
        grid=(BLOCKS, N // N_BLOCK),
        in_specs=[
            pl.BlockSpec((1, M, K), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K, N_BLOCK), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, M, N_BLOCK), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((BLOCKS, M, N), out_dtype),
    )

    @jax.jit
    def run(a, b, s):
        return call(a, b) + s  # s folds the iteration index in (no caching)

    return run, a, b


def build_xla(dtype, acc_dtype, out_dtype):
    """Same shapes through XLA's own batched dot_general (no Pallas) — the
    third route: round 1 probed XLA ``conv_general_dilated`` int8, round 2
    probed Mosaic ``dot_general`` int8; XLA-level matmul was never probed."""
    a = jnp.ones((BLOCKS, M, K), dtype)
    b = jnp.ones((BLOCKS, K, N), dtype)

    @jax.jit
    def run(a, b, s):
        o = jax.lax.dot_general(
            a, b,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=acc_dtype,
        ).astype(out_dtype)
        return o + s

    return run, a, b


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    flops = 2 * M * K * N * BLOCKS
    for name, builder, dtype, acc, out in (
        ("pallas bf16->f32", build, jnp.bfloat16, jnp.float32, jnp.bfloat16),
        ("pallas int8->i32", build, jnp.int8, jnp.int32, jnp.int32),
        ("xla    bf16->f32", build_xla, jnp.bfloat16, jnp.float32, jnp.bfloat16),
        ("xla    int8->i32", build_xla, jnp.int8, jnp.int32, jnp.int32),
    ):
        try:
            run, a, b = builder(dtype, acc, out)
            dt = forced_timeit(lambda i: run(a, b, jnp.asarray(i, out)), args.iters)
            print(f"{name}: {dt*1e3:7.2f} ms  {flops/dt/1e12:6.1f} T(FL)OP/s", flush=True)
        except Exception as e:
            print(f"{name}: FAILED {e}", flush=True)


if __name__ == "__main__":
    main()
