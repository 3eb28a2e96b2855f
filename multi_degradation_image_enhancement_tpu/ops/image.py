"""Low-level image primitives shared by the degradation ops.

All functions operate on batched NHWC float arrays.  Border handling matches
OpenCV's default ``BORDER_REFLECT_101`` (``jnp.pad`` mode ``"reflect"``),
which is what the reference's cv2 calls use
(``datasets_generation/generate_paired_degradation_dataset.py:107-159``).

TPU notes: the separable/tap-sum convolutions here are implemented as small
static unrolled shift-and-accumulate loops over the padded image.  Each tap
is a VPU multiply-add over the whole batch, XLA fuses the chain, and —
crucially — per-sample kernel *weights* (traced values) are supported with
no dynamic shapes, so a whole batch with different random severities
compiles to one fused kernel.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def reflect_pad_hw(x: jax.Array, ph: int, pw: int) -> jax.Array:
    """Pad H and W of [B,H,W,C] with BORDER_REFLECT_101 semantics."""
    return jnp.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)), mode="reflect")


def conv_taps_w(x: jax.Array, weights: jax.Array, radius: int) -> jax.Array:
    """Horizontal tap-sum correlation.

    Args:
      x: [B,H,W,C].
      weights: [B, 2*radius+1] per-sample tap weights, tap i at offset
        ``i - radius`` (correlation convention, like ``cv2.filter2D``).
      radius: static half-width.

    Returns [B,H,W,C].
    """
    b, h, w, c = x.shape
    xp = reflect_pad_hw(x, 0, radius)
    out = jnp.zeros_like(x)
    for i in range(2 * radius + 1):
        out = out + weights[:, i, None, None, None] * jax.lax.dynamic_slice_in_dim(
            xp, i, w, axis=2
        )
    return out


def conv_taps_h(x: jax.Array, weights: jax.Array, radius: int) -> jax.Array:
    """Vertical tap-sum correlation; see :func:`conv_taps_w`."""
    b, h, w, c = x.shape
    xp = reflect_pad_hw(x, radius, 0)
    out = jnp.zeros_like(x)
    for i in range(2 * radius + 1):
        out = out + weights[:, i, None, None, None] * jax.lax.dynamic_slice_in_dim(
            xp, i, h, axis=1
        )
    return out


def separable_blur(x: jax.Array, weights: jax.Array, radius: int) -> jax.Array:
    """Separable symmetric blur: same 1-D taps applied along W then H."""
    return conv_taps_h(conv_taps_w(x, weights, radius), weights, radius)


def conv3x3_fixed(x: jax.Array, kernel: jax.Array) -> jax.Array:
    """Depthwise 3×3 correlation with one fixed [3,3] kernel for all samples/channels.

    Matches ``F.conv2d(..., padding=1, groups=C)`` with zero padding, as used
    by the reference post-processing ops (``utils/post_processing.py:52,74``).
    """
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    b, h, w, c = x.shape
    out = jnp.zeros_like(x)
    for dy in range(3):
        for dx in range(3):
            patch = jax.lax.dynamic_slice(xp, (0, dy, dx, 0), (b, h, w, c))
            out = out + kernel[dy, dx] * patch
    return out


def rgb_to_luma(x: jax.Array) -> jax.Array:
    """ITU-R BT.601 luma, matching the reference's constants
    (``utils/loss_factory.py:207-212``, ``utils/post_processing.py:25``).

    [..., 3] -> [..., 1]
    """
    r, g, b = x[..., 0:1], x[..., 1:2], x[..., 2:3]
    return 0.2989 * r + 0.5870 * g + 0.1140 * b


def quantize_u8(x: jax.Array, mode: str = "floor") -> jax.Array:
    """Emulate a uint8 round-trip without leaving float.

    ``floor``: NumPy's ``clip(...).astype(uint8)`` truncation, used by most
    reference degradations.  ``round``: OpenCV's fixed-point rounding, used
    by cv2 filter outputs (GaussianBlur / filter2D / resize).
    """
    x = jnp.clip(x, 0.0, 255.0)
    if mode == "floor":
        return jnp.floor(x)
    if mode == "round":
        return jnp.round(x)
    raise ValueError(f"Unknown quantize mode: {mode}")


def resize_bilinear_cv(x: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """cv2.INTER_LINEAR-style bilinear resize (half-pixel centers, no antialias).

    ``jax.image.resize`` antialiases on downsampling, which cv2 does not; we
    use ``scale_and_translate`` with ``antialias=False`` to match cv2's
    sampling formula ``src = (dst + 0.5) * scale - 0.5``.

    x: [B,H,W,C].
    """
    b, h, w, c = x.shape
    scale = jnp.array([out_h / h, out_w / w], dtype=x.dtype)
    translate = 0.5 * (scale - 1.0)
    return jax.image.scale_and_translate(
        x,
        (b, out_h, out_w, c),
        (1, 2),
        scale,
        translate,
        method="linear",
        antialias=False,
    )


def resize_nearest_cv(x: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """cv2.INTER_NEAREST-style resize: src index = floor(dst * in/out).

    x: [B,H,W,C].
    """
    b, h, w, c = x.shape
    ys = jnp.floor(jnp.arange(out_h) * (h / out_h)).astype(jnp.int32)
    xs = jnp.floor(jnp.arange(out_w) * (w / out_w)).astype(jnp.int32)
    ys = jnp.clip(ys, 0, h - 1)
    xs = jnp.clip(xs, 0, w - 1)
    return x[:, ys][:, :, xs]
