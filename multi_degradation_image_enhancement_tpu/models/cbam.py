"""CBAM (Convolutional Block Attention Module) in Flax, NHWC.

Capability parity with the reference CBAM (``models/cbam.py:6-95`` in
/root/reference): a channel gate (shared 2-layer MLP over global avg+max
pooled channel vectors, summed, sigmoid) followed by a spatial gate
(channel-wise max+mean → 7×7 conv → sigmoid).  ``lp`` and ``lse`` pooling
variants are supported as in the reference.

TPU-first design notes
----------------------
* NHWC layout — channels on the 128-lane axis, so the channel-gate MLP is a
  lane-aligned matmul on the MXU and both gates fuse into the surrounding
  convs under XLA.
* Global pools are plain reductions (XLA fuses them); no explicit pooling
  kernels are needed.
* The 7×7 spatial-gate conv has only 2 input channels; XLA lowers it to a
  small im2col matmul — negligible next to the main convs.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


class BasicConv(nn.Module):
    """Conv(+BN)(+ReLU) helper, matching reference ``models/cbam.py:6-20``.

    The reference uses ``bias=False`` and BatchNorm(eps=1e-5, momentum=0.01);
    torch momentum 0.01 corresponds to Flax momentum 0.99.
    """

    features: int
    kernel_size: int
    use_bn: bool = True
    use_relu: bool = True
    dtype: jnp.dtype = jnp.float32
    stats_refresh: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        x = nn.Conv(
            self.features,
            (self.kernel_size, self.kernel_size),
            padding="SAME",
            use_bias=False,
            dtype=self.dtype,
        )(x)
        if self.use_bn:
            norm = train or self.stats_refresh
            x = nn.BatchNorm(
                use_running_average=not norm,
                momentum=0.99,
                epsilon=1e-5,
                dtype=jnp.float32 if norm else self.dtype,
            )(x)
        if self.use_relu:
            x = nn.relu(x)
        return x


def _logsumexp_hw(x: jax.Array) -> jax.Array:
    """LSE pool over spatial dims: [B,H,W,C] -> [B,C] (reference cbam.py:62-66)."""
    b, h, w, c = x.shape
    flat = x.reshape(b, h * w, c)
    return jax.scipy.special.logsumexp(flat, axis=1)


class ChannelGate(nn.Module):
    """Channel attention: shared MLP over pooled channel vectors.

    Parity: reference ``models/cbam.py:26-60``.  The MLP (Dense C→C/r→C with
    biases) is *shared* across pool types; per-pool outputs are summed before
    the sigmoid.
    """

    gate_channels: int
    reduction_ratio: int = 16
    pool_types: Sequence[str] = ("avg", "max")
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = self.gate_channels
        fc1 = nn.Dense(c // self.reduction_ratio, dtype=self.dtype, name="fc1")
        fc2 = nn.Dense(c, dtype=self.dtype, name="fc2")

        def mlp(v: jax.Array) -> jax.Array:
            return fc2(nn.relu(fc1(v)))

        att_sum = None
        for pool_type in self.pool_types:
            if pool_type == "avg":
                pooled = jnp.mean(x, axis=(1, 2))
            elif pool_type == "max":
                pooled = jnp.max(x, axis=(1, 2))
            elif pool_type == "lp":
                # L2 "power-average" pool as in torch F.lp_pool2d(norm_type=2):
                # (sum |x|^2)^(1/2) over the spatial window.
                pooled = jnp.sqrt(jnp.sum(jnp.square(x), axis=(1, 2)))
            elif pool_type == "lse":
                pooled = _logsumexp_hw(x)
            else:
                raise ValueError(f"Unknown pool type: {pool_type}")
            att = mlp(pooled)
            att_sum = att if att_sum is None else att_sum + att

        scale = jax.nn.sigmoid(att_sum)[:, None, None, :]
        return x * scale


class SpatialGate(nn.Module):
    """Spatial attention: [max_c, mean_c] → 7×7 conv → sigmoid scale.

    Parity: reference ``models/cbam.py:68-82`` (conv has BN, no ReLU).
    """

    dtype: jnp.dtype = jnp.float32
    stats_refresh: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        compress = jnp.concatenate(
            [jnp.max(x, axis=-1, keepdims=True), jnp.mean(x, axis=-1, keepdims=True)],
            axis=-1,
        )
        att = BasicConv(
            1, 7, use_bn=True, use_relu=False, dtype=self.dtype,
            stats_refresh=self.stats_refresh, name="spatial",
        )(compress, train=train)
        return x * jax.nn.sigmoid(att)


class CBAM(nn.Module):
    """Channel gate then spatial gate (reference ``models/cbam.py:84-95``)."""

    gate_channels: int
    reduction_ratio: int = 16
    pool_types: Sequence[str] = ("avg", "max")
    no_spatial: bool = False
    dtype: jnp.dtype = jnp.float32
    stats_refresh: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = ChannelGate(
            self.gate_channels, self.reduction_ratio, self.pool_types, dtype=self.dtype
        )(x)
        if not self.no_spatial:
            x = SpatialGate(dtype=self.dtype, stats_refresh=self.stats_refresh)(
                x, train=train
            )
        return x
