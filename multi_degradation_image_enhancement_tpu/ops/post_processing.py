"""Post-processing ops + factory, NHWC JAX.

Observable-behavior parity with the reference
(``utils/post_processing.py:5-77`` and ``utils/postprocessing_factory.py:11-41``
in /root/reference), including its quirks, kept deliberately (SURVEY.md §7):

  * ``sharpen`` adds ``eye(3)`` as a *matrix* to the 3×3 kernel (not a
    center-delta), then renormalizes — we reproduce that exact kernel;
  * each op auto-rescales inputs whose max exceeds 1.0 by /255 — here done
    with a jit-safe ``where`` instead of Python control flow.

All ops are pure, batched, and run inside the jitted eval step.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from multi_degradation_image_enhancement_tpu.ops.image import conv3x3_fixed, rgb_to_luma


def _auto01(images: jax.Array) -> jax.Array:
    """Reference guard: divide by 255 when data looks like 0..255 (jit-safe)."""
    scale = jnp.where(jnp.max(images) > 1.0, 1.0 / 255.0, 1.0)
    return images * scale


def enhance_contrast(images: jax.Array, contrast_factor: float = 1.1) -> jax.Array:
    """Mean-anchored contrast scale (reference ``utils/post_processing.py:5-15``)."""
    images = _auto01(images)
    mean = jnp.mean(images, axis=(1, 2), keepdims=True)  # per-sample, per-channel
    out = (images - mean) * contrast_factor + mean
    return jnp.clip(out, 0.0, 1.0)


def enhance_color(images: jax.Array, saturation_factor: float = 1.1) -> jax.Array:
    """Luma-anchored saturation scale (reference ``utils/post_processing.py:18-30``)."""
    images = _auto01(images)
    gray = rgb_to_luma(images)
    out = gray + saturation_factor * (images - gray)
    return jnp.clip(out, 0.0, 1.0)


def sharpen(images: jax.Array, strength: float = 0.5) -> jax.Array:
    """Sharpening filter with the reference's exact (quirky) kernel
    (``utils/post_processing.py:33-54``): base·strength + eye(3), normalized,
    depthwise 3×3 conv with zero padding."""
    images = _auto01(images)
    base = jnp.array([[0.0, -1.0, 0.0], [-1.0, 5.0, -1.0], [0.0, -1.0, 0.0]], jnp.float32)
    kernel = base * strength + jnp.eye(3, dtype=jnp.float32)
    kernel = kernel / jnp.sum(kernel)
    out = conv3x3_fixed(images, kernel)
    return jnp.clip(out, 0.0, 1.0)


def soft_denoise(images: jax.Array, sigma: float = 0.2) -> jax.Array:
    """Light Gaussian blend (reference ``utils/post_processing.py:57-77``):
    3×3 binomial blur mixed in with weight ``sigma``."""
    images = _auto01(images)
    kernel = jnp.array([[1.0, 2.0, 1.0], [2.0, 4.0, 2.0], [1.0, 2.0, 1.0]], jnp.float32) / 16.0
    blurred = conv3x3_fixed(images, kernel)
    out = (1.0 - sigma) * images + sigma * blurred
    return jnp.clip(out, 0.0, 1.0)


_OPS = {
    "enhance_contrast": enhance_contrast,
    "enhance_color": enhance_color,
    "sharpen": sharpen,
    "soft_denoise": soft_denoise,
}


def apply_postprocessing(images: jax.Array, pp_cfg: Dict[str, Any]) -> jax.Array:
    """String-dispatched op chain (reference ``utils/postprocessing_factory.py:19-41``)."""
    if not pp_cfg or not pp_cfg.get("enabled", False):
        return images
    out = images
    for op in pp_cfg.get("ops", []) or []:
        name = op["name"]
        if name not in _OPS:
            raise ValueError(f"Unknown post-processing op: {name}")
        out = _OPS[name](out, **(op.get("args", {}) or {}))
    return out
