"""Color-space conversions (OpenCV conventions) for device transforms.

Used by the HueSaturationValue and CLAHE augmentations
(``data.transforms``).  Conventions match cv2 on float math: HSV with
H∈[0,180), S,V∈[0,255]; LAB via D65 XYZ with L scaled to [0,255]
(cv2 8-bit convention).  cv2's uint8 paths use fixed-point LUTs, so parity
is within a few uint8 LSB, verified in tests.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rgb_to_hsv_cv(rgb: jax.Array) -> jax.Array:
    """[..., 3] RGB in 0..255 → HSV with H∈[0,180), S,V∈[0,255]."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    v = jnp.maximum(jnp.maximum(r, g), b)
    mn = jnp.minimum(jnp.minimum(r, g), b)
    diff = v - mn
    safe_diff = jnp.where(diff > 0, diff, 1.0)
    s = jnp.where(v > 0, diff / jnp.maximum(v, 1e-9) * 255.0, 0.0)
    h = jnp.where(
        v == r, 60.0 * (g - b) / safe_diff,
        jnp.where(v == g, 120.0 + 60.0 * (b - r) / safe_diff,
                  240.0 + 60.0 * (r - g) / safe_diff),
    )
    h = jnp.where(diff == 0, 0.0, h)
    h = jnp.where(h < 0, h + 360.0, h) / 2.0  # cv2: H/2 to fit uint8
    return jnp.stack([h, s, v], axis=-1)


def hsv_to_rgb_cv(hsv: jax.Array) -> jax.Array:
    """Inverse of :func:`rgb_to_hsv_cv` (H∈[0,180), S,V∈[0,255])."""
    h = hsv[..., 0] * 2.0  # degrees
    s = hsv[..., 1] / 255.0
    v = hsv[..., 2]
    c = v * s
    hp = h / 60.0
    x = c * (1.0 - jnp.abs(jnp.mod(hp, 2.0) - 1.0))
    m = v - c
    z = jnp.zeros_like(c)
    idx = jnp.clip(hp.astype(jnp.int32), 0, 5)
    r = jnp.select([idx == 0, idx == 1, idx == 2, idx == 3, idx == 4, idx == 5],
                   [c, x, z, z, x, c])
    g = jnp.select([idx == 0, idx == 1, idx == 2, idx == 3, idx == 4, idx == 5],
                   [x, c, c, x, z, z])
    b = jnp.select([idx == 0, idx == 1, idx == 2, idx == 3, idx == 4, idx == 5],
                   [z, z, x, c, c, x])
    return jnp.stack([r + m, g + m, b + m], axis=-1)


def _f_lab(t: jax.Array) -> jax.Array:
    d3 = (6.0 / 29.0) ** 3
    return jnp.where(t > d3, jnp.cbrt(t), t / (3 * (6.0 / 29.0) ** 2) + 4.0 / 29.0)


def rgb_to_lab_l(rgb: jax.Array) -> jax.Array:
    """[..., 3] RGB 0..255 → L channel in 0..255 (cv2 8-bit LAB convention)."""
    srgb = rgb / 255.0
    lin = jnp.where(srgb > 0.04045, ((srgb + 0.055) / 1.055) ** 2.4, srgb / 12.92)
    y = (0.212671 * lin[..., 0] + 0.715160 * lin[..., 1] + 0.072169 * lin[..., 2])
    l_star = 116.0 * _f_lab(y) - 16.0  # 0..100
    return l_star * 255.0 / 100.0


def replace_lab_l(rgb: jax.Array, new_l255: jax.Array) -> jax.Array:
    """Rescale RGB so its LAB L channel becomes ``new_l255`` (chroma-preserving).

    Exact LAB round-trips are gather/LUT-heavy; scaling linear-light RGB by
    the luminance ratio preserves hue/saturation and matches cv2's
    L-replacement within a few LSB for CLAHE-sized adjustments.
    """
    old_l = rgb_to_lab_l(rgb)
    # invert L* → Y for old and new
    def y_of_l(l255):
        l_star = l255 * 100.0 / 255.0
        fy = (l_star + 16.0) / 116.0
        d = 6.0 / 29.0
        return jnp.where(fy > d, fy**3, 3 * d * d * (fy - 4.0 / 29.0))

    ratio = y_of_l(new_l255) / jnp.maximum(y_of_l(old_l), 1e-6)
    srgb = rgb / 255.0
    lin = jnp.where(srgb > 0.04045, ((srgb + 0.055) / 1.055) ** 2.4, srgb / 12.92)
    lin = lin * ratio[..., None]
    srgb2 = jnp.where(lin > 0.0031308, 1.055 * lin ** (1 / 2.4) - 0.055, 12.92 * lin)
    return jnp.clip(srgb2 * 255.0, 0.0, 255.0)
