"""Severity-parameterized degradations (the classifier workload's flavor).

The classifier dataset generator uses severity∈[0,1]-parameterized versions
of the nine degradations with mappings that differ from the paired
generator's ranges (``datasets_generation/generate_classifier_dataset.py:212-338``
in /root/reference):

  blur              k = {3,5,7,9}[round(sev·3)]
  noise             σ = 5 + 45·sev
  low_light         × (0.45 − 0.40·sev)
  jpeg              quality = round(80 − 70·sev)
  pixelation        factor = round(4 + 12·sev)
  motion_blur       k = odd(round(5 + 20·sev)), **random angle** ∈ [0,180)
  high_light        × (1.2 + 1.8·sev)
  low_contrast      α = 0.8 − 0.6·sev
  color_distortion  per-channel gains ~ U(1±0.4·sev)

All run batched on device.  The rotated motion-blur PSF reproduces the
reference's cv2 ``warpAffine(INTER_LINEAR)`` rasterization of a horizontal
line analytically (bilinear line coverage in closed form), so no dynamic
shapes and no host OpenCV in the loop.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from multi_degradation_image_enhancement_tpu.ops import degradations as D
from multi_degradation_image_enhancement_tpu.ops.image import quantize_u8, reflect_pad_hw

MAX_MOTION_K = 25
_MOTION_R = MAX_MOTION_K // 2  # 12


def rotated_line_kernel(k: jax.Array, angle_deg: jax.Array) -> jax.Array:
    """Per-sample [B, 25, 25] PSF: length-k horizontal line rotated by angle.

    Mirrors cv2.getRotationMatrix2D + warpAffine(INTER_LINEAR) of a line
    image (reference generate_classifier_dataset.py:272-288): each kernel
    pixel bilinearly samples the un-rotated line, computed here in closed
    form.  k may be even or odd; the line lives on row k//2 of a virtual k×k
    canvas centered at (k/2, k/2).
    """
    kf = k.astype(jnp.float32)[:, None, None]
    c = kf / 2.0  # cv2 center (k/2, k/2)
    row = (k // 2).astype(jnp.float32)[:, None, None]

    ys = jnp.arange(MAX_MOTION_K, dtype=jnp.float32)[None, :, None]
    xs = jnp.arange(MAX_MOTION_K, dtype=jnp.float32)[None, None, :]
    # embed the virtual k×k canvas at the center of the 25×25 canvas
    off = (MAX_MOTION_K - kf) / 2.0
    x = xs - off
    y = ys - off

    theta = jnp.deg2rad(angle_deg)[:, None, None]
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    # warpAffine: dst(x,y) = src(invM·(x,y)); M rotates CCW by angle about c.
    # invM rotates CW: sx = c + cos·(x−c) − sin·(y−c); sy = c + sin·(x−c) + cos·(y−c)
    dx, dy = x - c, y - c
    sx = c + cos * dx - sin * dy
    sy = c + sin * dx + cos * dy

    wy = jnp.maximum(0.0, 1.0 - jnp.abs(sy - row))
    f = jnp.floor(sx)
    t = sx - f
    left_valid = (f >= 0.0) & (f <= kf - 1.0)
    right_valid = (f + 1.0 >= 0.0) & (f + 1.0 <= kf - 1.0)
    wx = jnp.where(left_valid, 1.0 - t, 0.0) + jnp.where(right_valid, t, 0.0)

    # cv2 rasterizes onto a k×k canvas — taps falling outside it are cropped
    # (visible at angles where the line tip leaves the box, e.g. 90°).
    in_canvas = (x >= 0.0) & (x <= kf - 1.0) & (y >= 0.0) & (y <= kf - 1.0)
    kern = wy * wx * in_canvas.astype(jnp.float32)
    s = jnp.sum(kern, axis=(1, 2), keepdims=True)
    return jnp.where(s > 1e-8, kern / s, kern)


def motion_blur_rotated(images: jax.Array, k: jax.Array, angle_deg: jax.Array) -> jax.Array:
    """Correlate each sample with its own rotated-line PSF (reflect-101 border)."""
    b, h, w, c = images.shape
    kern = rotated_line_kernel(k, angle_deg)  # [B,25,25]
    xp = reflect_pad_hw(images, _MOTION_R, _MOTION_R)

    def conv_one(img, kk):
        rhs = jnp.broadcast_to(kk[:, :, None, None], (MAX_MOTION_K, MAX_MOTION_K, 1, c))
        return jax.lax.conv_general_dilated(
            img[None],
            rhs,
            window_strides=(1, 1),
            padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c,
        )[0]

    out = jax.vmap(conv_one)(xp, kern)
    return quantize_u8(out, "round")


def apply_severity(
    name: str, images: jax.Array, sev: jax.Array, key: jax.Array
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Apply degradation ``name`` at per-sample severity ∈ [0,1].

    Args:
      images: [B,H,W,3] float32 in 0..255.
      sev: [B] severities.
      key: PRNG key (used by noise / motion angle / color gains).

    Returns (degraded images, params dict recording the realized parameters).
    """
    b = images.shape[0]
    if name == "blur":
        k_idx = jnp.clip(jnp.round(sev * 3).astype(jnp.int32), 0, 3)
        return D.gaussian_blur(images, k_idx), {"k": 3 + 2 * k_idx}
    if name == "noise":
        std = 5.0 + sev * 45.0
        return D.add_gaussian_noise(images, std, key), {"std": std}
    if name == "low_light":
        factor = 0.45 - sev * 0.40
        return D.low_light(images, factor), {"factor": factor}
    if name == "jpeg":
        quality = jnp.round(80.0 - sev * 70.0)
        return D.jpeg_compress(images, quality), {"quality": quality}
    if name == "pixelation":
        factor = jnp.round(4.0 + sev * 12.0).astype(jnp.int32)
        return D.pixelate(images, factor), {"factor": factor}
    if name == "motion_blur":
        k = jnp.maximum(3, jnp.round(5.0 + sev * 20.0).astype(jnp.int32))
        k = jnp.where(k % 2 == 0, k + 1, k)
        angle = jax.random.uniform(key, (b,), minval=0.0, maxval=180.0)
        return motion_blur_rotated(images, k, angle), {"k": k, "angle_deg": angle}
    if name == "high_light":
        factor = 1.2 + sev * 1.8
        return D.high_light(images, factor), {"factor": factor}
    if name == "low_contrast":
        alpha = 0.8 - sev * 0.6
        return D.low_contrast(images, alpha), {"alpha": alpha}
    if name == "color_distortion":
        amp = (0.4 * sev)[:, None]
        gains = jax.random.uniform(key, (b, 3), minval=1.0 - amp, maxval=1.0 + amp)
        return D.color_distortion(images, gains), {"gains": gains}
    raise ValueError(f"Unknown degradation: {name}")
