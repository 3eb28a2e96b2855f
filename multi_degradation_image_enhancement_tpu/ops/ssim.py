"""SSIM and PSNR in pure JAX with torchmetrics-compatible semantics.

The reference evaluates PSNR/SSIM via torchmetrics
(``utils/metrics_factory.py:74-94`` in /root/reference) with default
settings: SSIM uses an 11×11 Gaussian window (σ=1.5), k1=0.01, k2=0.03,
*valid* windows only, mean over batch/channels/positions; both metrics
default to a data range inferred from the data
(``max(preds.max-preds.min, target.max-target.min)``) when not given.

TPU notes: the Gaussian windowing is two separable 11-tap convolutions —
small VPU work XLA fuses with the elementwise SSIM map; everything reduces
on device to one scalar (no host sync inside jit).
"""

from __future__ import annotations

from typing import Optional, Union

import jax
import jax.numpy as jnp

DataRange = Union[float, str, None]


def _resolve_data_range(
    preds: jax.Array, target: jax.Array, data_range: DataRange
) -> jax.Array:
    if data_range is None or data_range == "auto":
        # torchmetrics with data_range=None
        return jnp.maximum(
            jnp.max(preds) - jnp.min(preds), jnp.max(target) - jnp.min(target)
        )
    return jnp.asarray(float(data_range), preds.dtype)


def masked_mean(x: jax.Array, mask: Optional[jax.Array]) -> jax.Array:
    """Mean over all elements of the valid samples.

    ``mask`` is a per-sample validity vector [B] of {0,1}; ``None`` means all
    valid.  Because every sample has the same element count, the mean over
    valid elements equals the mask-weighted mean of per-sample means — which
    is how it's computed (shape-stable under jit, used by pad-and-mask
    partial batches).
    """
    if mask is None:
        return jnp.mean(x)
    per_sample = jnp.mean(x.reshape(x.shape[0], -1), axis=1)
    m = mask.astype(per_sample.dtype)
    return jnp.sum(per_sample * m) / jnp.maximum(jnp.sum(m), 1.0)


def psnr(
    preds: jax.Array,
    target: jax.Array,
    data_range: DataRange = "auto",
    mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Peak signal-to-noise ratio over the whole batch (one scalar).

    Matches ``torchmetrics.PeakSignalNoiseRatio`` defaults: MSE reduced over
    every element, ``10·log10(range² / mse)``.  ``mask`` restricts the MSE
    to valid samples (pad-and-mask partial batches).
    """
    dr = _resolve_data_range(preds, target, data_range)
    mse = masked_mean(jnp.square(preds - target), mask)
    return 10.0 * jnp.log10(jnp.square(dr) / mse)


def _gaussian_window(kernel_size: int, sigma: float) -> jnp.ndarray:
    x = jnp.arange(kernel_size, dtype=jnp.float32) - (kernel_size - 1) / 2.0
    w = jnp.exp(-(x * x) / (2.0 * sigma * sigma))
    return w / jnp.sum(w)


def _filter_valid(x: jax.Array, taps: jnp.ndarray) -> jax.Array:
    """Separable valid-mode filter on [B,H,W,C] (H then W)."""
    k = taps.shape[0]
    # along H
    out = sum(
        taps[i] * jax.lax.slice_in_dim(x, i, x.shape[1] - (k - 1) + i, axis=1)
        for i in range(k)
    )
    # along W
    out = sum(
        taps[i] * jax.lax.slice_in_dim(out, i, out.shape[2] - (k - 1) + i, axis=2)
        for i in range(k)
    )
    return out


def ssim(
    preds: jax.Array,
    target: jax.Array,
    data_range: DataRange = "auto",
    kernel_size: int = 11,
    sigma: float = 1.5,
    k1: float = 0.01,
    k2: float = 0.03,
    mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Structural similarity (Wang et al.), one scalar over the batch.

    Inputs are NHWC; torchmetrics semantics (Gaussian window, valid-mode
    windows, elementwise mean over all valid positions/channels/samples).
    ``mask`` restricts the mean to valid samples.
    """
    dr = _resolve_data_range(preds, target, data_range)
    c1 = jnp.square(k1 * dr)
    c2 = jnp.square(k2 * dr)

    taps = _gaussian_window(kernel_size, sigma).astype(preds.dtype)

    mu_x = _filter_valid(preds, taps)
    mu_y = _filter_valid(target, taps)
    mu_xx = _filter_valid(preds * preds, taps)
    mu_yy = _filter_valid(target * target, taps)
    mu_xy = _filter_valid(preds * target, taps)

    sigma_x = mu_xx - mu_x * mu_x
    sigma_y = mu_yy - mu_y * mu_y
    sigma_xy = mu_xy - mu_x * mu_y

    num = (2.0 * mu_x * mu_y + c1) * (2.0 * sigma_xy + c2)
    den = (mu_x * mu_x + mu_y * mu_y + c1) * (sigma_x + sigma_y + c2)
    return masked_mean(num / den, mask)
