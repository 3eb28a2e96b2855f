#!/usr/bin/env python
"""Experiment: NHWC <-> channel-major boundary relayout strategies.

The channel-major DenseBlock kernel (ops/pallas/dense_block_cm.py) pays
~17 ms/step in XLA boundary transposes (PERF.md round-2 table).  This
experiment times, per DenseBlock shape, on the real TPU:

  prologue  = NHWC -> [B, c0p, halo+HW+halo]  (transpose + chan pad + halo pad)
  epilogue  = [B, c_outp, HW] -> NHWC

strategies:
  xla  — lax.transpose/reshape/pad (what _run_cm does today)
  mxu  — matmul against a constant identity: the relayout rides the MXU
         (tiny FLOPs, no Mosaic/XLA relayout pass)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from benchmarks.microbench import forced_timeit

HALO_ROWS = 5


def _ceil16(n: int) -> int:
    return ((n + 15) // 16) * 16


def make_fns(h, w, c):
    hw = h * w
    halo = HALO_ROWS * w
    c0p = _ceil16(c)

    @jax.jit
    def pro_xla(x):
        b = x.shape[0]
        xcm = x.transpose(0, 3, 1, 2).reshape(b, c, hw)
        return jnp.pad(xcm, ((0, 0), (0, c0p - c), (halo, halo)))

    eye_in = jnp.eye(c, c0p, dtype=jnp.bfloat16)  # [C, c0p]

    @jax.jit
    def pro_mxu(x):
        b = x.shape[0]
        xf = x.reshape(b, hw, c)
        xcm = jax.lax.dot_general(
            eye_in, xf,
            dimension_numbers=(((0,), (2,)), ((), ())),
            preferred_element_type=jnp.bfloat16,
        )  # [c0p, B, HW]
        xcm = xcm.transpose(1, 0, 2)
        return jnp.pad(xcm, ((0, 0), (0, 0), (halo, halo)))

    eye_out = jnp.eye(c0p, c, dtype=jnp.bfloat16)  # [c0p, C]

    @jax.jit
    def epi_xla(ycm):  # [B, c0p, HW] -> NHWC
        b = ycm.shape[0]
        return ycm[:, :c, :].transpose(0, 2, 1).reshape(b, h, w, c)

    @jax.jit
    def epi_mxu(ycm):
        b = ycm.shape[0]
        y = jax.lax.dot_general(
            ycm, eye_out,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.bfloat16,
        )  # [B, HW, C]
        return y.reshape(b, h, w, c)

    return pro_xla, pro_mxu, epi_xla, epi_mxu


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    iters = 20
    shapes = [(128, 128, 64), (64, 64, 128), (32, 32, 256), (256, 256, 3)]
    key = jax.random.key(0)
    for h, w, c in shapes:
        c0p = _ceil16(c)
        x = jax.random.normal(key, (B, h, w, c), jnp.bfloat16)
        ycm = jax.random.normal(key, (B, c0p, h * w), jnp.bfloat16)
        pro_xla, pro_mxu, epi_xla, epi_mxu = make_fns(h, w, c)
        # parity check first
        a, bq = pro_xla(x), pro_mxu(x)
        assert a.shape == bq.shape, (a.shape, bq.shape)
        d = float(jnp.max(jnp.abs(a.astype(jnp.float32) - bq.astype(jnp.float32))))
        e1, e2 = epi_xla(ycm), epi_mxu(ycm)
        d2 = float(jnp.max(jnp.abs(e1.astype(jnp.float32) - e2.astype(jnp.float32))))
        row = {"shape": f"DB({c})@{h}x{w}", "pro_err": d, "epi_err": d2}
        for name, fn, arg in [
            ("pro_xla", pro_xla, x), ("pro_mxu", pro_mxu, x),
            ("epi_xla", epi_xla, ycm), ("epi_mxu", epi_mxu, ycm),
        ]:
            dt = forced_timeit(lambda i, f=fn, a=arg: f(a), iters)
            row[name + "_ms"] = round(dt * 1e3, 3)
        print(row, flush=True)


if __name__ == "__main__":
    main()
