"""The nine degradation families as batched, on-device JAX transforms.

Capability parity with the reference's offline OpenCV generators
(``datasets_generation/generate_paired_degradation_dataset.py:107-191``),
with identical parameter ranges:

  blur              Gaussian blur, k ∈ {3,5,7,9} (cv2 sigma=0 kernels)
  noise             additive Gaussian, σ ∈ [10,50]
  low_light         intensity × [0.05, 0.4]
  jpeg              DCT quantization round-trip, quality ∈ [10,50]
  pixelation        factor ∈ [4,16]: bilinear down, nearest up
  motion_blur       horizontal line PSF, k ∈ [5,25]
  high_light        intensity × [1.5, 3.0]
  low_contrast      blend to per-channel mean, α ∈ [0.3, 0.7]
  color_distortion  per-channel gains ∈ [0.6, 1.4]

Unlike the reference (per-image uint8 OpenCV calls in a CPU loop + PNG
round-trip + DataLoader workers), these run on whole batches in HBM: each
training step synthesizes its (degraded, clean) pairs on device.  All ops are
static-shaped and jit/vmap/pjit-friendly; per-sample random severities are
traced values.

Value convention: float32 in **0..255** (the uint8 domain the reference's
math lives in).  Each op ends with the same uint8 lattice quantization the
reference incurs (cv2 outputs round; NumPy ``astype(uint8)`` truncates), so
the on-device data distribution matches the reference's on-disk datasets.
Divide by 255 afterwards for network input.

Two-level API:
  * ``sample_params(name, key, batch)``        → per-sample severity params
  * ``apply_with_params(name, images, params)``→ deterministic transform
  * ``apply_degradation(name, images, key)``   → the two combined
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from multi_degradation_image_enhancement_tpu.ops.image import (
    conv_taps_w,
    quantize_u8,
    separable_blur,
)
from multi_degradation_image_enhancement_tpu.ops.jpeg import jpeg_roundtrip

DEGRADATIONS: Tuple[str, ...] = (
    "blur",
    "noise",
    "low_light",
    "jpeg",
    "pixelation",
    "motion_blur",
    "high_light",
    "low_contrast",
    "color_distortion",
)

# cv2.getGaussianKernel with sigma<=0 uses fixed tables for k ∈ {3,5,7} and
# the σ = 0.3·((k−1)/2 − 1) + 0.8 formula for k = 9 (σ = 1.7).  Each row is a
# 9-tap kernel centered at index 4, zero-padded.
def _gaussian_taps_9(sigma: float) -> jnp.ndarray:
    x = jnp.arange(9, dtype=jnp.float32) - 4.0
    w = jnp.exp(-(x * x) / (2.0 * sigma * sigma))
    return w / jnp.sum(w)


GAUSSIAN_KERNEL_TABLE = jnp.stack(
    [
        jnp.array([0, 0, 0, 0.25, 0.5, 0.25, 0, 0, 0], jnp.float32),
        jnp.array([0, 0, 0.0625, 0.25, 0.375, 0.25, 0.0625, 0, 0], jnp.float32),
        jnp.array(
            [0, 0.03125, 0.109375, 0.21875, 0.28125, 0.21875, 0.109375, 0.03125, 0],
            jnp.float32,
        ),
        _gaussian_taps_9(1.7),
    ]
)  # [4, 9] for k = 3, 5, 7, 9


# ---------------------------------------------------------------------------
# Parameter sampling (reference ranges, JAX PRNG)
# ---------------------------------------------------------------------------


def sample_params(name: str, key: jax.Array, batch: int) -> Dict[str, jax.Array]:
    """Sample per-sample severity parameters with the reference's ranges."""
    if name == "blur":
        return {"k_idx": jax.random.randint(key, (batch,), 0, 4)}
    if name == "noise":
        k1, k2 = jax.random.split(key)
        return {"std": jax.random.uniform(k1, (batch,), minval=10.0, maxval=50.0), "noise_key": k2}
    if name == "low_light":
        return {"factor": jax.random.uniform(key, (batch,), minval=0.05, maxval=0.4)}
    if name == "jpeg":
        return {"quality": jax.random.randint(key, (batch,), 10, 51)}
    if name == "pixelation":
        return {"factor": jax.random.randint(key, (batch,), 4, 17)}
    if name == "motion_blur":
        return {"k": jax.random.randint(key, (batch,), 5, 26)}
    if name == "high_light":
        return {"factor": jax.random.uniform(key, (batch,), minval=1.5, maxval=3.0)}
    if name == "low_contrast":
        return {"alpha": jax.random.uniform(key, (batch,), minval=0.3, maxval=0.7)}
    if name == "color_distortion":
        return {"gains": jax.random.uniform(key, (batch, 3), minval=0.6, maxval=1.4)}
    raise ValueError(f"Unknown degradation: {name}")


# ---------------------------------------------------------------------------
# Deterministic transforms
# ---------------------------------------------------------------------------


def gaussian_blur(images: jax.Array, k_idx: jax.Array) -> jax.Array:
    """Gaussian blur with per-sample kernel index into {3,5,7,9}."""
    weights = GAUSSIAN_KERNEL_TABLE[k_idx]  # [B, 9]
    out = separable_blur(images, weights, radius=4)
    return quantize_u8(out, "round")


def add_gaussian_noise(images: jax.Array, std: jax.Array, noise_key: jax.Array) -> jax.Array:
    if jnp.ndim(noise_key) == 1:  # per-sample keys (file-stable generation)
        n = jax.vmap(lambda k: jax.random.normal(k, images.shape[1:], images.dtype))(noise_key)
    else:
        n = jax.random.normal(noise_key, images.shape, dtype=images.dtype)
    out = images + std[:, None, None, None] * n
    return quantize_u8(out, "floor")


def low_light(images: jax.Array, factor: jax.Array) -> jax.Array:
    return quantize_u8(images * factor[:, None, None, None], "floor")


def high_light(images: jax.Array, factor: jax.Array) -> jax.Array:
    return quantize_u8(images * factor[:, None, None, None], "floor")


def jpeg_compress(images: jax.Array, quality: jax.Array) -> jax.Array:
    return jpeg_roundtrip(images, quality)


def _axis_interp_matrix(size: int, factor: jax.Array) -> jax.Array:
    """Per-sample [B, size, size] matrix composing cv2 INTER_LINEAR downsample
    (to ``size // factor``) with INTER_NEAREST upsample back to ``size``.

    Because both resizes are separable and the composite map per output pixel
    is two bilinear taps of the source, the whole pixelation becomes two
    batched matmuls — MXU work instead of dynamic-shape resizes.
    """
    b = factor.shape[0]
    f = factor.astype(jnp.float32)
    small = jnp.maximum(1.0, jnp.floor(size / f))  # cv2: small = size // factor
    dst = jnp.arange(size, dtype=jnp.float32)[None, :]  # [1, size]
    # INTER_NEAREST: small index = floor(dst * small / size)
    sx = jnp.floor(dst * small[:, None] / size)
    sx = jnp.clip(sx, 0.0, small[:, None] - 1.0)
    # INTER_LINEAR sample position of small pixel sx in the original:
    # u = (sx + 0.5) * (size / small) - 0.5
    u = (sx + 0.5) * (size / small[:, None]) - 0.5
    u = jnp.clip(u, 0.0, size - 1.0)
    i0 = jnp.floor(u)
    frac = u - i0
    i0 = i0.astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, size - 1)
    eye = jnp.eye(size, dtype=jnp.float32)
    m = eye[i0] * (1.0 - frac)[..., None] + eye[i1] * frac[..., None]  # [B, size, size]
    return m


def pixelate(images: jax.Array, factor: jax.Array) -> jax.Array:
    """cv2-equivalent pixelation with per-sample traced factors.

    Parity with reference ``pixelation()`` (generate_paired...py:135-144):
    clamp factor to [2, min(H,W)//2], bilinear downsample by ``factor``,
    nearest-neighbor upsample back.
    """
    b, h, w, c = images.shape
    max_factor = max(2, min(h, w) // 2)
    f = jnp.clip(factor, 2, max_factor)
    ay = _axis_interp_matrix(h, f)  # [B, H, H]
    ax = _axis_interp_matrix(w, f)  # [B, W, W]
    out = jnp.einsum("bij,bjwc->biwc", ay, images, preferred_element_type=jnp.float32)
    out = jnp.einsum("bkw,bhwc->bhkc", ax, out, preferred_element_type=jnp.float32)
    # cv2 rounds the small uint8 image before the nearest upsample; since
    # nearest only replicates values, rounding the output is equivalent.
    return quantize_u8(out, "round")


def motion_blur(images: jax.Array, k: jax.Array) -> jax.Array:
    """Horizontal line PSF of per-sample length k ∈ [5,25] (cv2.filter2D anchor
    semantics: taps at offsets j − k//2 for j ∈ [0,k), weight 1/k)."""
    radius = 12  # max offset for k = 25
    offsets = jnp.arange(-radius, radius + 1, dtype=jnp.int32)[None, :]  # [1, 25]
    kk = k[:, None]
    lo = -(kk // 2)
    hi = kk - 1 - kk // 2
    mask = (offsets >= lo) & (offsets <= hi)
    weights = mask.astype(jnp.float32) / kk.astype(jnp.float32)
    out = conv_taps_w(images, weights, radius)
    return quantize_u8(out, "round")


def low_contrast(images: jax.Array, alpha: jax.Array) -> jax.Array:
    m = jnp.mean(images, axis=(1, 2), keepdims=True)  # per-channel mean
    a = alpha[:, None, None, None]
    return quantize_u8(a * images + (1.0 - a) * m, "floor")


def color_distortion(images: jax.Array, gains: jax.Array) -> jax.Array:
    return quantize_u8(images * gains[:, None, None, :], "floor")


_APPLY = {
    "blur": lambda imgs, p: gaussian_blur(imgs, p["k_idx"]),
    "noise": lambda imgs, p: add_gaussian_noise(imgs, p["std"], p["noise_key"]),
    "low_light": lambda imgs, p: low_light(imgs, p["factor"]),
    "jpeg": lambda imgs, p: jpeg_compress(imgs, p["quality"]),
    "pixelation": lambda imgs, p: pixelate(imgs, p["factor"]),
    "motion_blur": lambda imgs, p: motion_blur(imgs, p["k"]),
    "high_light": lambda imgs, p: high_light(imgs, p["factor"]),
    "low_contrast": lambda imgs, p: low_contrast(imgs, p["alpha"]),
    "color_distortion": lambda imgs, p: color_distortion(imgs, p["gains"]),
}


def apply_with_params(name: str, images: jax.Array, params: Dict[str, jax.Array]) -> jax.Array:
    """Apply degradation ``name`` with explicit per-sample parameters."""
    if name not in _APPLY:
        raise ValueError(f"Unknown degradation: {name}. Available: {DEGRADATIONS}")
    return _APPLY[name](images, params)


def apply_degradation(name: str, images: jax.Array, key: jax.Array) -> jax.Array:
    """Apply degradation ``name`` with random reference-range severities.

    Args:
      name: one of :data:`DEGRADATIONS`.
      images: [B,H,W,3] float32 in 0..255.
      key: PRNG key.
    """
    params = sample_params(name, key, images.shape[0])
    return apply_with_params(name, images, params)


def degrade_batch(images: jax.Array, name: str, key: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Produce a (degraded, clean) training pair in the network's [0,1] domain.

    Args:
      images: clean batch [B,H,W,3] float32 in 0..255.

    Returns ``(degraded01, clean01)``.
    """
    degraded = apply_degradation(name, images, key)
    return degraded / 255.0, images / 255.0
