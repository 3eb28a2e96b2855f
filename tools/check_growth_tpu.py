#!/usr/bin/env python
"""On-hardware numeric check of the trainable fused DenseBlock.

The interpreter-mode oracle tests (tests/test_growth_train.py) validate the
math, but Mosaic lowering differs from interpretation (the
dynamic_update_slice regression proved it), and bf16 kernel arithmetic can
drift from the XLA path.  This script runs BOTH training forwards and their
gradients on the real device and reports max deviations: value + grads of a
scalar loss w.r.t. params, at a small CDAN-like DenseBlock composition.

Exits nonzero if deviations exceed bf16-class tolerances.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from multi_degradation_image_enhancement_tpu.models.cdan import DenseBlock


def main() -> None:
    B, H, W, C = 4, 64, 96, 16
    key = jax.random.key(0)
    x = jax.random.uniform(jax.random.fold_in(key, 1), (B, H, W, C), jnp.float32)

    canonical = DenseBlock(features=C, fused=False)
    fused = DenseBlock(features=C, fused=True)
    variables = canonical.init({"params": key}, jnp.zeros((1, H, W, C)), train=True)

    def loss(mod, params):
        out, upd = mod.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, train=True, mutable=["batch_stats"],
        )
        return jnp.mean(out * out) + 0.1 * jnp.mean(jnp.abs(out))

    v_c, g_c = jax.jit(jax.value_and_grad(lambda p: loss(canonical, p)))(variables["params"])
    v_f, g_f = jax.jit(jax.value_and_grad(lambda p: loss(fused, p)))(variables["params"])

    dv = abs(float(v_c) - float(v_f))
    leaves_c = jax.tree_util.tree_leaves(g_c)
    leaves_f = jax.tree_util.tree_leaves(g_f)
    # Relative deviation with an absolute floor: conv-bias grads under a
    # following BatchNorm are ~1e-8 (the mean subtraction cancels them), so
    # a pure ratio there is noise/noise.
    dg = max(
        float(jnp.max(jnp.abs(a - b))) / max(float(jnp.max(jnp.abs(a))), 1e-4)
        for a, b in zip(leaves_c, leaves_f)
    )
    print(f"[check_growth_tpu] backend={jax.default_backend()} "
          f"|Δloss|={dv:.3e}  max rel grad dev={dg:.3e}")
    ok = dv < 5e-3 and dg < 5e-2
    print("[check_growth_tpu]", "OK" if ok else "FAILED")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
