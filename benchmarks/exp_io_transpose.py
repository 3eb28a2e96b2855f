#!/usr/bin/env python
"""Experiment: in-kernel transposes for the channel-major DenseBlock I/O.

The cm kernel's NHWC↔[C,P] boundary transposes run in XLA at ~10-15% of
HBM bandwidth (~17 ms/step total at B=128 — PERF.md).  If Mosaic supports
non-canonical dot_general forms on the MXU, the transposes can be absorbed
into identity matmuls inside the kernel (zero extra HBM traffic):

  in : feats[c,p] = Σ_k I[c,k]·x[p,k]   — rhs-transposed contraction
  out: y[p,c]    = Σ_k ot[k,p]·I[k,c]   — lhs-transposed contraction

This script checks (a) Mosaic accepts these forms, (b) their cost vs the
XLA transpose path, on the DB(64)@128² shape.
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def forced(fn, *args, iters=20):
    red = jax.jit(lambda acc, o: acc + jnp.sum(o.astype(jnp.float32)))
    acc = red(jnp.zeros(()), fn(*args))
    float(acc)
    t0 = time.perf_counter()
    acc = jnp.zeros(())
    for _ in range(iters):
        acc = red(acc, fn(*args))
    float(acc)
    return (time.perf_counter() - t0) / iters


def kernel_rhsT(x_ref, i_ref, o_ref):
    # x: [1, P, C] row-major; I: [C, C]; out: [1, C, P]
    o_ref[0] = jax.lax.dot_general(
        i_ref[:],
        x_ref[0],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


def kernel_lhsT(x_ref, i_ref, o_ref):
    # x: [1, C, P] channel-major; I: [C, C]; out: [1, P, C]
    o_ref[0] = jax.lax.dot_general(
        x_ref[0],
        i_ref[:],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


def kernel_jnpT(x_ref, o_ref):
    o_ref[0] = x_ref[0].T


def main():
    B, H, W, C = 128, 128, 128, 64
    P = H * W
    x = jnp.arange(B * P * C, dtype=jnp.int32).astype(jnp.bfloat16).reshape(B, P, C) * 1e-4
    eye = jnp.eye(C, dtype=jnp.bfloat16)

    # rhs-transposed identity dot: [P,C] -> [C,P]
    try:
        f = jax.jit(
            lambda x: pl.pallas_call(
                kernel_rhsT,
                grid=(B,),
                in_specs=[
                    pl.BlockSpec((1, P, C), lambda i: (i, 0, 0)),
                    pl.BlockSpec((C, C), lambda i: (0, 0)),
                ],
                out_specs=pl.BlockSpec((1, C, P), lambda i: (i, 0, 0)),
                out_shape=jax.ShapeDtypeStruct((B, C, P), jnp.bfloat16),
            )(x.reshape(B, 1, P, C)[:, 0], eye)
        )
        y = f(x)
        ok = bool(jnp.allclose(y[3], x[3].T, atol=1e-3))
        dt = forced(f, x)
        print(f"rhsT identity-dot : ok={ok}  {dt*1e3:.2f} ms")
    except Exception as e:
        print(f"rhsT identity-dot : FAILED {type(e).__name__}: {str(e)[:300]}")

    # lhs-transposed identity dot: [C,P] -> [P,C]
    xc = x.transpose(0, 2, 1)
    try:
        f = jax.jit(
            lambda x: pl.pallas_call(
                kernel_lhsT,
                grid=(B,),
                in_specs=[
                    pl.BlockSpec((1, C, P), lambda i: (i, 0, 0)),
                    pl.BlockSpec((C, C), lambda i: (0, 0)),
                ],
                out_specs=pl.BlockSpec((1, P, C), lambda i: (i, 0, 0)),
                out_shape=jax.ShapeDtypeStruct((B, P, C), jnp.bfloat16),
            )(x, eye)
        )
        y = f(xc)
        ok = bool(jnp.allclose(y[3], xc[3].T, atol=1e-3))
        dt = forced(f, xc)
        print(f"lhsT identity-dot : ok={ok}  {dt*1e3:.2f} ms")
    except Exception as e:
        print(f"lhsT identity-dot : FAILED {type(e).__name__}: {str(e)[:300]}")

    # plain jnp .T inside the kernel
    try:
        f = jax.jit(
            lambda x: pl.pallas_call(
                kernel_jnpT,
                grid=(B,),
                in_specs=[pl.BlockSpec((1, P, C), lambda i: (i, 0, 0))],
                out_specs=pl.BlockSpec((1, C, P), lambda i: (i, 0, 0)),
                out_shape=jax.ShapeDtypeStruct((B, C, P), jnp.bfloat16),
            )(x)
        )
        y = f(x)
        ok = bool(jnp.allclose(y[3], x[3].T, atol=1e-3))
        dt = forced(f, x)
        print(f"in-kernel jnp .T  : ok={ok}  {dt*1e3:.2f} ms")
    except Exception as e:
        print(f"in-kernel jnp .T  : FAILED {type(e).__name__}: {str(e)[:300]}")

    # XLA baselines
    f_xla = jax.jit(lambda x: x.transpose(0, 2, 1))
    dt = forced(f_xla, x)
    print(f"XLA transpose     : {dt*1e3:.2f} ms")
    f_copy = jax.jit(lambda x: x + jnp.bfloat16(1))
    dt = forced(f_copy, x)
    print(f"XLA copy (bw ref) : {dt*1e3:.2f} ms")


if __name__ == "__main__":
    main()
