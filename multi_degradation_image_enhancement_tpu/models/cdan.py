"""CDAN restoration network in Flax, NHWC, bf16-capable.

Topology parity with the reference CDAN (``models/cdan.py:8-176`` in
/root/reference; 3,585,663 parameters — asserted in tests):

* Encoder: four ConvBlocks 3→64→128→256→512 with 2×2 max-pool after the
  first three; per-scale DenseBlocks (growth 16, 4 layers) computed on the
  pooled features and kept as multiplicative gates; dropout 0.2.
* Bottleneck: CBAM(512).
* Decoder: per scale — 3×3 conv (the reference's ConvTranspose2d k3/s1/p1 is
  spatially conv-equivalent, see SURVEY.md §7 quirks) + BN + ReLU, additive
  skip, CBAM, multiplicative dense gate; bilinear ×2 upsampling at three
  points; global residual add of the input; final DenseBlock(3→3) + sigmoid.

Shape contract: input [B, H, W, 3] in [0,1], H and W multiples of 8;
output same shape in [0,1].

TPU-first design notes
----------------------
* NHWC so channels ride the 128-lane axis; all convs hit the MXU.
* ``dtype`` sets the compute dtype (bf16 recommended on TPU); parameters and
  BN statistics stay fp32 (Flax default param_dtype).
* Bilinear ×2 upsample uses ``jax.image.resize`` (half-pixel centers —
  identical semantics to torch ``align_corners=False``).
* Everything is static-shaped and jit-friendly; no Python control flow
  depends on values.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from multi_degradation_image_enhancement_tpu.models.cbam import CBAM


def _bilinear_x2(x: jax.Array) -> jax.Array:
    """×2 half-pixel bilinear upsample (torch ``align_corners=False`` semantics).

    Measured head-to-head on v5e at B=128/256²: XLA's lowering of
    ``jax.image.resize`` beats a hand-written shift/interleave variant
    (1903 vs 1718 img/s full-model) — the interleave's stack+reshape on the
    minor dims costs relayouts.  Keep the resize.
    """
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, 2 * h, 2 * w, c), method="bilinear")


class ConvBlock(nn.Module):
    """Conv 3×3 → BN → ReLU (reference ``models/cdan.py:8-19``)."""

    features: int
    dtype: jnp.dtype = jnp.float32
    stats_refresh: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        norm = train or self.stats_refresh
        x = nn.Conv(self.features, (3, 3), padding="SAME", dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not norm, momentum=0.9,
                         dtype=jnp.float32 if norm else self.dtype)(x)
        return nn.relu(x)


class _BNVars(nn.Module):
    """Owns BatchNorm variables with ``nn.BatchNorm``-identical tree layout.

    Used by the fused DenseBlock path, which computes the normalization
    itself (incremental concat stats + a Pallas affine+ReLU+conv kernel) but
    must keep checkpoints interchangeable with the canonical path.
    """

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((self.features,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((self.features,), jnp.float32)
        )
        return scale, bias, ra_mean, ra_var


class _ConvVars(nn.Module):
    """Owns conv kernel+bias with ``nn.Conv``-identical tree layout/init."""

    kshape: Tuple[int, int, int, int]

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), self.kshape, jnp.float32
        )
        bias = self.param("bias", nn.initializers.zeros, (self.kshape[-1],), jnp.float32)
        return kernel, bias


def _channel_stats(t_cm: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Per-channel (mean, biased var) of ``[B, C, HW]`` — Flax
    ``_compute_stats`` semantics: f32, E[x²]−E[x]², negatives clipped."""
    tf = t_cm.astype(jnp.float32)
    mu = jnp.mean(tf, axis=(0, 2))
    mu2 = jnp.mean(jnp.square(tf), axis=(0, 2))
    return mu, jnp.maximum(mu2 - jnp.square(mu), 0.0)


class DenseBlock(nn.Module):
    """DenseNet-style block (reference ``models/cdan.py:22-53``).

    ``num_layers`` iterations of BN→ReLU→3×3 conv (``growth_rate`` features)
    on the channel-concat of all previous features, then a BN→ReLU→1×1
    transition conv to ``features`` channels.

    The 16-output growth convs are the model's hot spot on TPU; a tap-packed
    matmul reformulation (tap-packed convs; since removed) was evaluated and *rejected* —
    its [B·H·W, 9F] intermediate costs gigabytes of padded HBM traffic at
    full resolution (honest timing: final DB @256² 137 ms tap-packed).  The
    dedicated Pallas fused kernel is the planned fast path.

    ``fused=True`` routes the growth layers through the trainable
    channel-major Pallas kernel (``ops/pallas/growth_train.py``, custom VJP)
    with BatchNorm computed incrementally in XLA — same variable tree, same
    math (gradient-equivalence tested), usable in train AND eval mode.
    """

    features: int
    growth_rate: int = 16
    num_layers: int = 4
    dtype: jnp.dtype = jnp.float32
    stats_refresh: bool = False
    fused: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        if self.fused and self.growth_rate == 16:
            from multi_degradation_image_enhancement_tpu.ops.pallas.growth_train import (
                growth_supported,
            )

            h_img, w_img, c0 = x.shape[1], x.shape[2], x.shape[3]
            cs = [c0 + self.growth_rate * i for i in range(self.num_layers)]
            itemsize = jnp.dtype(x.dtype).itemsize
            if all(growth_supported(h_img, w_img, c, itemsize) for c in cs):
                return self._fused_impl(x, train)
        norm = train or self.stats_refresh
        feats = x
        for i in range(self.num_layers):
            h = nn.BatchNorm(
                use_running_average=not norm, momentum=0.9, dtype=jnp.float32 if norm else self.dtype, name=f"bn_{i}"
            )(feats)
            h = nn.relu(h)
            h = nn.Conv(
                self.growth_rate, (3, 3), padding="SAME", dtype=self.dtype, name=f"conv_{i}"
            )(h)
            # Concatenation on the channel (lane) axis — cheap on TPU, and the
            # next conv consumes it directly from VMEM.
            feats = jnp.concatenate([feats, h], axis=-1)
        out = nn.BatchNorm(
            use_running_average=not norm, momentum=0.9, dtype=jnp.float32 if norm else self.dtype, name="bn_t"
        )(feats)
        out = nn.relu(out)
        out = nn.Conv(self.features, (1, 1), dtype=self.dtype, name="conv_t")(out)
        return out

    def _fused_impl(self, x: jax.Array, train: bool) -> jax.Array:
        """Channel-major fused path: growth layers via the custom-VJP Pallas
        kernel; BN stats incremental (per-channel stats of a concat are the
        concat of per-channel stats, so each layer only measures its 16 new
        channels).  Variable tree identical to the canonical branch."""
        from multi_degradation_image_enhancement_tpu.ops.pallas.dense_block_cm import (
            _ceil16,
        )
        from multi_degradation_image_enhancement_tpu.ops.pallas.growth_train import (
            growth_layer_cm,
            pack_growth,
        )

        interp = jax.default_backend() != "tpu"
        norm = train or self.stats_refresh
        bsz, h_img, w_img, c0 = x.shape
        hw = h_img * w_img
        feats = x.transpose(0, 3, 1, 2).reshape(bsz, c0, hw)

        mus: list = []
        var_list: list = []
        if norm:
            mu, var = _channel_stats(feats)
            mus.append(mu)
            var_list.append(var)

        c = c0
        for i in range(self.num_layers):
            scale, bn_bias, ra_mean, ra_var = _BNVars(c, name=f"bn_{i}")()
            if norm:
                mean = jnp.concatenate(mus) if len(mus) > 1 else mus[0]
                var = jnp.concatenate(var_list) if len(var_list) > 1 else var_list[0]
                if not self.is_initializing():
                    ra_mean.value = 0.9 * ra_mean.value + 0.1 * mean
                    ra_var.value = 0.9 * ra_var.value + 0.1 * var
            else:
                mean, var = ra_mean.value, ra_var.value
            a = scale * jax.lax.rsqrt(var + 1e-5)
            b = bn_bias - mean * a
            kernel, cbias = _ConvVars((3, 3, c, self.growth_rate), name=f"conv_{i}")()
            A_pack = pack_growth(kernel, _ceil16(c))
            g = growth_layer_cm(
                feats, a, b, A_pack, cbias, c, (h_img, w_img), interp
            )
            if norm:
                gm, gv = _channel_stats(g)
                mus.append(gm)
                var_list.append(gv)
            feats = jnp.concatenate([feats, g], axis=1)
            c += self.growth_rate

        scale, bn_bias, ra_mean, ra_var = _BNVars(c, name="bn_t")()
        if norm:
            mean = jnp.concatenate(mus)
            var = jnp.concatenate(var_list)
            if not self.is_initializing():
                ra_mean.value = 0.9 * ra_mean.value + 0.1 * mean
                ra_var.value = 0.9 * ra_var.value + 0.1 * var
        else:
            mean, var = ra_mean.value, ra_var.value
        a = scale * jax.lax.rsqrt(var + 1e-5)
        b = bn_bias - mean * a
        vt = jnp.maximum(
            feats.astype(jnp.float32) * a[None, :, None] + b[None, :, None], 0.0
        )
        kernel_t, bias_t = _ConvVars((1, 1, c, self.features), name="conv_t")()
        out_cm = (
            jnp.einsum(
                "cf,bcl->bfl",
                kernel_t[0, 0].astype(self.dtype),
                vt.astype(self.dtype),
            )
            + bias_t[None, :, None].astype(self.dtype)
        )
        return out_cm.reshape(bsz, self.features, h_img, w_img).transpose(0, 2, 3, 1)


def _block_classes(remat: bool):
    """(ConvBlock, DenseBlock, CBAM), per-block rematerialized when asked.

    ``nn.checkpoint`` with ``train`` static (argnum 2 of ``(self, x, train)``)
    recomputes each block's internals during backward instead of storing
    them — verified bit-exact against the plain path including BatchNorm
    mutation and dropout RNG (tests/test_engine.py remat equivalence).
    """
    if not remat:
        return ConvBlock, DenseBlock, CBAM
    return (
        nn.checkpoint(ConvBlock, static_argnums=(2,)),
        nn.checkpoint(DenseBlock, static_argnums=(2,)),
        nn.checkpoint(CBAM, static_argnums=(2,)),
    )


class Encoder(nn.Module):
    """Reference ``models/cdan.py:55-98``."""

    dtype: jnp.dtype = jnp.float32
    remat: bool = False
    stats_refresh: bool = False
    fused_dense: bool = False
    growth_rate: int = 16

    @nn.compact
    def __call__(
        self, x: jax.Array, *, train: bool = False
    ) -> Tuple[jax.Array, Tuple[jax.Array, ...], Tuple[jax.Array, ...]]:
        Conv, Dense, _ = _block_classes(self.remat)
        sr = self.stats_refresh
        drop = nn.Dropout(0.2, deterministic=not train)
        skips = []
        denses = []

        out = Conv(64, dtype=self.dtype, stats_refresh=sr, name="conv1")(x, train)
        out = nn.max_pool(out, (2, 2), strides=(2, 2))
        denses.append(Dense(64, growth_rate=self.growth_rate, dtype=self.dtype, stats_refresh=sr, fused=self.fused_dense, name="dense1")(out, train))
        out = drop(out)
        skips.append(out)

        out = Conv(128, dtype=self.dtype, stats_refresh=sr, name="conv2")(out, train)
        out = nn.max_pool(out, (2, 2), strides=(2, 2))
        denses.append(Dense(128, growth_rate=self.growth_rate, dtype=self.dtype, stats_refresh=sr, fused=self.fused_dense, name="dense2")(out, train))
        out = drop(out)
        skips.append(out)

        out = Conv(256, dtype=self.dtype, stats_refresh=sr, name="conv3")(out, train)
        out = nn.max_pool(out, (2, 2), strides=(2, 2))
        denses.append(Dense(256, growth_rate=self.growth_rate, dtype=self.dtype, stats_refresh=sr, fused=self.fused_dense, name="dense3")(out, train))
        out = drop(out)
        skips.append(out)

        out = Conv(512, dtype=self.dtype, stats_refresh=sr, name="conv4")(out, train)
        out = drop(out)

        return out, tuple(skips), tuple(denses)


class Decoder(nn.Module):
    """Reference ``models/cdan.py:100-159``.

    The reference's ``ConvTranspose2d(k=3, s=1, p=1)`` layers are spatially
    conv-equivalent (stride 1), so we use plain 3×3 convs — identical
    parameter count and receptive field, and a straight MXU matmul.
    """

    dtype: jnp.dtype = jnp.float32
    remat: bool = False
    stats_refresh: bool = False
    fused_dense: bool = False
    growth_rate: int = 16

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        out: jax.Array,
        skips: Tuple[jax.Array, ...],
        denses: Tuple[jax.Array, ...],
        *,
        train: bool = False,
    ) -> jax.Array:
        _, Dense, Cbam = _block_classes(self.remat)
        sr = self.stats_refresh
        norm = train or sr

        def deconv_bn_relu(h, feats, name):
            h = nn.Conv(feats, (3, 3), padding="SAME", dtype=self.dtype, name=f"{name}_conv")(h)
            h = nn.BatchNorm(
                use_running_average=not norm, momentum=0.9, dtype=jnp.float32 if norm else self.dtype, name=f"{name}_bn"
            )(h)
            return nn.relu(h)

        out = deconv_bn_relu(out, 256, "de1")
        out = out + skips[2]
        out = Cbam(256, dtype=self.dtype, stats_refresh=sr, name="cbam1")(out, train)

        out = out * denses[2]
        out = deconv_bn_relu(out, 128, "de2")
        out = _bilinear_x2(out)
        out = out + skips[1]
        out = Cbam(128, dtype=self.dtype, stats_refresh=sr, name="cbam2")(out, train)

        out = out * denses[1]
        out = deconv_bn_relu(out, 64, "de3")
        out = _bilinear_x2(out)
        out = out + skips[0]
        out = Cbam(64, dtype=self.dtype, stats_refresh=sr, name="cbam3")(out, train)

        out = out * denses[0]
        out = deconv_bn_relu(out, 3, "de4")
        out = _bilinear_x2(out)
        out = out + x  # global residual (reference cdan.py:154)

        out = Dense(3, growth_rate=self.growth_rate, dtype=self.dtype, stats_refresh=sr, fused=self.fused_dense, name="final_dense")(out, train)
        return jax.nn.sigmoid(out)


class CDAN(nn.Module):
    """CDAN encoder–decoder with CBAM attention (reference ``models/cdan.py:164-176``).

    ``remat=True`` rematerializes every ConvBlock/DenseBlock/CBAM during
    backward (per-block ``nn.checkpoint``) — the whole-forward checkpoint the
    engine used before saved nothing at peak (the backward recompute restores
    all residuals at once); per-block scoping is what actually trades FLOPs
    for activation memory.

    ``stats_refresh=True`` is the BN-recalibration ("precise BN") mode: with
    ``train=False`` it runs BatchNorm on batch statistics (updating the
    running averages when applied with ``mutable=["batch_stats"]``) while
    keeping dropout deterministic.  The training EMA tracks fast-moving
    weights, so the stats saved with a checkpoint lag the final weights; a
    few frozen-weight refresh passes over the training data re-centers them
    (measured +4.4 dB test PSNR on the low_light parity task — PARITY.md).
    The parameter tree is unchanged, so refresh instances apply to any
    existing checkpoint.

    ``growth_rate`` (default 16 = reference parity, 3,585,663 params)
    widens every DenseBlock's growth convs — the model's hot spot sits on
    a structural 1/8-of-peak MXU roofline at 16 output channels (PERF.md
    roofline), so a wide variant (e.g. 64/128) is the named architectural
    opt-in for quality-per-wall-clock beyond the bf16 ceiling.  Non-16
    growth keeps the XLA path (the fused Pallas kernels specialize on 16).
    """

    dtype: jnp.dtype = jnp.float32
    remat: bool = False
    stats_refresh: bool = False
    fused_dense: bool = False
    growth_rate: int = 16

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        _, _, Cbam = _block_classes(self.remat)
        sr = self.stats_refresh
        out, skips, denses = Encoder(
            dtype=self.dtype, remat=self.remat, stats_refresh=sr,
            fused_dense=self.fused_dense, growth_rate=self.growth_rate,
            name="encoder"
        )(x, train=train)
        out = Cbam(512, dtype=self.dtype, stats_refresh=sr, name="bottleneck")(out, train)
        out = Decoder(
            dtype=self.dtype, remat=self.remat, stats_refresh=sr,
            fused_dense=self.fused_dense, growth_rate=self.growth_rate,
            name="decoder"
        )(x, out, skips, denses, train=train)
        # Return in the compute dtype's fp32 form for stable losses/metrics.
        return out.astype(jnp.float32)
