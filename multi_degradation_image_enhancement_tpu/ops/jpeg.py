"""On-device JPEG degradation: an 8×8 DCT / quantize / dequantize round-trip.

The reference degrades images through a real libjpeg encode/decode at random
quality q∈[10,50] (``datasets_generation/generate_paired_degradation_dataset.py:125-132``).
libjpeg is CPU-only, so this module reproduces the artifact pipeline in pure
JAX so that JPEG-degraded training pairs can be synthesized in HBM each step:

  RGB → JFIF YCbCr → 4:2:0 chroma subsample → per-plane 8×8 DCT-II →
  IJG quality-scaled quantization (round) → dequantize → IDCT →
  "fancy" (triangle) chroma upsample → RGB.

Bit-parity with libjpeg's integer DCT is not attainable (or needed — see
SURVEY.md §7 "Hard parts"); parity is defined at the restored-PSNR level.
Quantization tables, the quality→scale mapping, the 2×2-average downsample
and the 3:1 triangle upsample all follow the IJG implementation.

TPU notes: the blockwise DCT is expressed as two 8×8 matmul contractions via
``einsum`` over [..., 8, 8] blocks — XLA maps these onto the MXU in batch.
Everything is static-shaped; per-sample quality factors are traced values.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

# IJG standard quantization tables (Annex K of the JPEG spec).
LUMA_QTABLE = jnp.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=jnp.float32,
)

CHROMA_QTABLE = jnp.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=jnp.float32,
)


def _dct8_matrix() -> jnp.ndarray:
    """Orthonormal 8-point DCT-II matrix D such that X_dct = D @ x @ D.T."""
    k = jnp.arange(8, dtype=jnp.float32)[:, None]
    n = jnp.arange(8, dtype=jnp.float32)[None, :]
    m = jnp.cos((2.0 * n + 1.0) * k * (math.pi / 16.0))
    alpha = jnp.where(k == 0, math.sqrt(1.0 / 8.0), math.sqrt(2.0 / 8.0))
    return alpha * m


_DCT8 = _dct8_matrix()


def quality_to_qtables(quality: jax.Array) -> tuple[jax.Array, jax.Array]:
    """IJG quality (1..100) → (luma, chroma) quantization tables.

    Follows ``jpeg_quality_scaling`` + ``jpeg_add_quant_table``:
    scale = 5000/q for q<50 else 200-2q; T = clamp(floor((base*scale+50)/100), 1, 255).
    ``quality`` may be per-sample shaped [B]; tables broadcast to [B,8,8].
    """
    q = jnp.asarray(quality, dtype=jnp.float32)
    scale = jnp.where(q < 50.0, jnp.floor(5000.0 / q), 200.0 - 2.0 * q)
    scale = scale[..., None, None]

    def scaled(base):
        t = jnp.floor((base * scale + 50.0) / 100.0)
        return jnp.clip(t, 1.0, 255.0)

    return scaled(LUMA_QTABLE), scaled(CHROMA_QTABLE)


def _to_blocks(plane: jax.Array) -> jax.Array:
    """[B,H,W] → [B, H/8, W/8, 8, 8] blocks."""
    b, h, w = plane.shape
    blocks = plane.reshape(b, h // 8, 8, w // 8, 8)
    return blocks.transpose(0, 1, 3, 2, 4)


def _from_blocks(blocks: jax.Array) -> jax.Array:
    """[B, Hb, Wb, 8, 8] → [B, H, W]."""
    b, hb, wb, _, _ = blocks.shape
    return blocks.transpose(0, 1, 3, 2, 4).reshape(b, hb * 8, wb * 8)


def dct2_blocks(blocks: jax.Array) -> jax.Array:
    """8×8 DCT-II on [..., 8, 8] blocks (two MXU contractions)."""
    return jnp.einsum(
        "ij,...jk,lk->...il", _DCT8, blocks, _DCT8, preferred_element_type=jnp.float32
    )


def idct2_blocks(coefs: jax.Array) -> jax.Array:
    """Inverse of :func:`dct2_blocks` (orthonormal, so D.T on both sides)."""
    return jnp.einsum(
        "ji,...jk,kl->...il", _DCT8, coefs, _DCT8, preferred_element_type=jnp.float32
    )


def _quantize_plane(plane: jax.Array, qtable: jax.Array) -> jax.Array:
    """DCT → quantize(round) → dequantize → IDCT for one [B,H,W] plane.

    qtable: [8,8] or [B,8,8].
    """
    blocks = _to_blocks(plane - 128.0)
    coefs = dct2_blocks(blocks)
    if qtable.ndim == 3:
        qt = qtable[:, None, None, :, :]
    else:
        qt = qtable
    q = jnp.round(coefs / qt) * qt
    rec = idct2_blocks(q)
    return _from_blocks(rec) + 128.0


def rgb_to_ycbcr(rgb: jax.Array) -> tuple[jax.Array, jax.Array, jax.Array]:
    """JFIF RGB→YCbCr, inputs/outputs in 0..255. rgb: [B,H,W,3]."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168735892 * r - 0.331264108 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418687589 * g - 0.081312411 * b + 128.0
    return y, cb, cr


def ycbcr_to_rgb(y: jax.Array, cb: jax.Array, cr: jax.Array) -> jax.Array:
    """JFIF YCbCr→RGB, [B,H,W] planes → [B,H,W,3] in 0..255 (unclipped)."""
    cb = cb - 128.0
    cr = cr - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136286 * cb - 0.714136286 * cr
    b = y + 1.772 * cb
    return jnp.stack([r, g, b], axis=-1)


def _downsample_2x2(plane: jax.Array) -> jax.Array:
    """h2v2 chroma downsample: 2×2 mean. [B,H,W] → [B,H/2,W/2]."""
    b, h, w = plane.shape
    return plane.reshape(b, h // 2, 2, w // 2, 2).mean(axis=(2, 4))


def _fancy_upsample_axis(plane: jax.Array, axis: int) -> jax.Array:
    """libjpeg h2v2 "fancy" triangle upsample along one axis (×2).

    Output sample 2i = (3·x[i] + x[i-1]) / 4, sample 2i+1 = (3·x[i] + x[i+1]) / 4,
    with edge replication — the h2v2_fancy_upsample weighting.
    """
    prev = jnp.concatenate(
        [jax.lax.slice_in_dim(plane, 0, 1, axis=axis), jax.lax.slice_in_dim(plane, 0, -1, axis=axis)],
        axis=axis,
    )
    nxt = jnp.concatenate(
        [jax.lax.slice_in_dim(plane, 1, None, axis=axis), jax.lax.slice_in_dim(plane, -1, None, axis=axis)],
        axis=axis,
    )
    even = (3.0 * plane + prev) * 0.25
    odd = (3.0 * plane + nxt) * 0.25
    stacked = jnp.stack([even, odd], axis=axis + 1)
    shape = list(plane.shape)
    shape[axis] *= 2
    return stacked.reshape(shape)


def _fancy_upsample_2x2(plane: jax.Array) -> jax.Array:
    """[B,H,W] → [B,2H,2W] triangle upsample (axis 1 then axis 2)."""
    return _fancy_upsample_axis(_fancy_upsample_axis(plane, 1), 2)


def jpeg_roundtrip(rgb: jax.Array, quality: jax.Array) -> jax.Array:
    """JPEG-compress-and-decode a batch of images on device.

    Args:
      rgb: [B,H,W,3] float32 in 0..255.
      quality: scalar or [B] IJG quality factor(s), traced values allowed.

    Returns [B,H,W,3] float32 in 0..255 (rounded to the uint8 lattice).
    """
    b, h, w, _ = rgb.shape
    # Pad to a multiple of 16 (full 4:2:0 MCUs) with edge replication, as
    # libjpeg pads partial MCUs by edge duplication.
    ph = (-h) % 16
    pw = (-w) % 16
    if ph or pw:
        rgb = jnp.pad(rgb, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="edge")

    quality = jnp.broadcast_to(jnp.asarray(quality, jnp.float32), (b,))
    luma_qt, chroma_qt = quality_to_qtables(quality)  # [B,8,8] each

    y, cb, cr = rgb_to_ycbcr(rgb)
    cb = _downsample_2x2(cb)
    cr = _downsample_2x2(cr)

    y = _quantize_plane(y, luma_qt)
    cb = _quantize_plane(cb, chroma_qt)
    cr = _quantize_plane(cr, chroma_qt)

    cb = _fancy_upsample_2x2(cb)
    cr = _fancy_upsample_2x2(cr)

    out = ycbcr_to_rgb(y, cb, cr)
    out = jnp.round(jnp.clip(out, 0.0, 255.0))
    if ph or pw:
        out = out[:, :h, :w, :]
    return out
