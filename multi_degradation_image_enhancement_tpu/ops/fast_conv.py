"""MXU-friendly 3×3 convolution for tiny output channel counts.

CDAN's DenseBlocks are its hot spot on TPU: each growth conv produces only
16 output channels, so XLA's native convolution uses ~12% of the MXU's
output columns and the measured utilization collapses to ~3.5%
(DenseBlock(64) at 128² costs 35 ms of a 67 ms full forward at B=128).

``conv3x3_tap_packed`` restructures the conv: contract channels against all
nine taps at once —

    y = x · W_packed            # [B,H,W,C] @ [C, 9·F] — one big matmul
    out(i,j) = Σ_{dy,dx} y_{dy,dx}(i+dy−1, j+dx−1)     # 9 shifted adds (VPU)

which is mathematically identical to the SAME-padded correlation but feeds
the MXU a 9·F-column matmul instead of nine F-column ones.  For F=16 that
is 144 columns — ~4.5× better MXU occupancy, and the shifted adds fuse.

``Conv3x3TapPacked`` is a drop-in ``nn.Conv(F, (3,3), padding='SAME')``
replacement with an identical parameter tree (kernel [3,3,C,F] HWIO + bias),
so checkpoints are interchangeable with the plain-conv model.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


def conv3x3_tap_packed(x: jax.Array, kernel: jax.Array, bias: jax.Array | None) -> jax.Array:
    """SAME-padded 3×3 correlation via one channel-contraction matmul.

    Args:
      x: [B,H,W,C].
      kernel: [3,3,C,F] (HWIO, same as nn.Conv).
      bias: [F] or None.
    """
    b, h, w, c = x.shape
    f = kernel.shape[-1]
    # [3,3,C,F] → [C, 3,3,F] → [C, 9F]
    packed = kernel.transpose(2, 0, 1, 3).reshape(c, 9 * f)
    y = jax.lax.dot_general(
        x.reshape(b * h * w, c),
        packed,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(b, h, w, 3, 3, f)

    # out(i,j) = Σ_{dy,dx} y[..., dy, dx, :] sampled at (i+dy−1, j+dx−1):
    # pad y spatially once, then accumulate the 9 shifted views.
    ypad = jnp.pad(y, ((0, 0), (1, 1), (1, 1), (0, 0), (0, 0), (0, 0)))
    out = jnp.zeros((b, h, w, f), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            out = out + jax.lax.dynamic_slice(
                ypad, (0, dy, dx, dy, dx, 0), (b, h, w, 1, 1, f)
            ).reshape(b, h, w, f)
    if bias is not None:
        out = out + bias
    return out.astype(x.dtype)


class Conv3x3TapPacked(nn.Module):
    """Drop-in for ``nn.Conv(features, (3,3), padding='SAME')`` (same params)."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (3, 3, c, self.features), jnp.float32
        )
        bias = self.param("bias", nn.initializers.zeros_init(), (self.features,), jnp.float32)
        return conv3x3_tap_packed(
            x.astype(self.dtype), kernel.astype(self.dtype), bias.astype(self.dtype)
        )
