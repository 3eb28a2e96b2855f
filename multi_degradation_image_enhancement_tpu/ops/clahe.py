"""CLAHE (contrast-limited adaptive histogram equalization) on device.

Batched JAX implementation of cv2.createCLAHE semantics for the
albumentations ``CLAHE`` transform (reference transform whitelist,
``utils/transforms_factory.py:74-75``): per-tile 256-bin histograms of the
(uint8-quantized) L channel, clip-limited with uniform excess
redistribution, per-tile equalization LUTs, and bilinear interpolation of
the four neighboring tile LUTs per pixel.  Applied to the LAB L channel of
RGB inputs like albumentations does.

TPU notes: histograms build as one-hot matmuls (tile_pixels × 256 — MXU
work), the LUT lookup is a [B·ty·tx, 256] gather per pixel via one-hot
contraction; everything is static-shaped and vmap/jit friendly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from multi_degradation_image_enhancement_tpu.ops.color import replace_lab_l, rgb_to_lab_l


def _tile_luts(l_u8: jax.Array, grid: int, clip_limit: float) -> jax.Array:
    """Per-tile equalization LUTs. l_u8: [B,H,W] integers 0..255 → [B,g,g,256]."""
    b, h, w = l_u8.shape
    th, tw = h // grid, w // grid
    tiles = l_u8.reshape(b, grid, th, grid, tw).transpose(0, 1, 3, 2, 4)
    tiles = tiles.reshape(b, grid, grid, th * tw)

    onehot = jax.nn.one_hot(tiles, 256, dtype=jnp.float32)  # [B,g,g,P,256]
    hist = jnp.sum(onehot, axis=3)  # [B,g,g,256]

    # clip + uniform redistribution (cv2: limit = max(clip*P/256, 1))
    limit = jnp.maximum(clip_limit * (th * tw) / 256.0, 1.0)
    excess = jnp.sum(jnp.maximum(hist - limit, 0.0), axis=-1, keepdims=True)
    hist = jnp.minimum(hist, limit) + excess / 256.0

    cdf = jnp.cumsum(hist, axis=-1)
    scale = 255.0 / (th * tw)
    return jnp.clip(jnp.round(cdf * scale), 0.0, 255.0)  # [B,g,g,256]


def clahe_l_channel(l255: jax.Array, grid: int = 8, clip_limit: float = 4.0) -> jax.Array:
    """CLAHE on an L-channel image [B,H,W] in 0..255 (H,W divisible by grid)."""
    b, h, w = l255.shape
    l_u8 = jnp.clip(jnp.round(l255), 0, 255).astype(jnp.int32)
    luts = _tile_luts(l_u8, grid, clip_limit)  # [B,g,g,256]

    th, tw = h // grid, w // grid
    # tile-center coordinates for bilinear LUT interpolation
    ys = (jnp.arange(h, dtype=jnp.float32) - th / 2.0 + 0.5) / th
    xs = (jnp.arange(w, dtype=jnp.float32) - tw / 2.0 + 0.5) / tw
    y0 = jnp.clip(jnp.floor(ys), 0, grid - 1).astype(jnp.int32)
    x0 = jnp.clip(jnp.floor(xs), 0, grid - 1).astype(jnp.int32)
    y1 = jnp.clip(y0 + 1, 0, grid - 1)
    x1 = jnp.clip(x0 + 1, 0, grid - 1)
    fy = jnp.clip(ys - jnp.floor(ys), 0.0, 1.0)
    fy = jnp.where(ys < 0, 0.0, jnp.where(ys > grid - 1, 1.0, fy))[:, None]
    fx = jnp.clip(xs - jnp.floor(xs), 0.0, 1.0)
    fx = jnp.where(xs < 0, 0.0, jnp.where(xs > grid - 1, 1.0, fx))[None, :]

    def lookup(ty, tx):
        # gather per-pixel LUT values for tile (ty[y], tx[x])
        lut_px = luts[:, ty][:, :, tx]  # [B,H,W,256]
        return jnp.take_along_axis(lut_px, l_u8[..., None], axis=-1)[..., 0]

    v00 = lookup(y0, x0)
    v01 = lookup(y0, x1)
    v10 = lookup(y1, x0)
    v11 = lookup(y1, x1)
    top = v00 * (1 - fx) + v01 * fx
    bot = v10 * (1 - fx) + v11 * fx
    return top * (1 - fy) + bot * fy


def clahe_rgb(rgb255: jax.Array, grid: int = 8, clip_limit: float = 4.0) -> jax.Array:
    """albumentations-style CLAHE on RGB [B,H,W,3] in 0..255 (via LAB L)."""
    l_chan = rgb_to_lab_l(rgb255)
    new_l = clahe_l_channel(l_chan, grid=grid, clip_limit=clip_limit)
    return replace_lab_l(rgb255, new_l)
