"""Fused CDAN inference forward (serving path).

Consumes the canonical ``models.cdan.CDAN`` variables tree and replays the
same topology (reference ``/root/reference/models/cdan.py:164-176``) with the
serving-time optimisations XLA cannot do on the module path:

* the five DenseBlocks run through the channel-major Pallas kernel
  (``ops.pallas.dense_block_cm``) — measured ≥1.5–2× over XLA at the two
  dominant grids (see PERF.md);
* every inference BatchNorm that directly follows a conv is folded into the
  conv's kernel/bias (one fewer elementwise pass over each activation);
* CBAM gates and upsamples reuse the canonical Flax modules, applied with
  the matching parameter subtrees.

The train path is untouched — training keeps the Flax module and XLA autodiff.

Numerical contract: equals ``CDAN(dtype).apply(variables, x, train=False)``
to bf16 tolerance (tested in ``tests/test_cdan_fast.py``).
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
from flax import linen as nn

from multi_degradation_image_enhancement_tpu.models.cbam import CBAM
from multi_degradation_image_enhancement_tpu.models.cdan import _bilinear_x2
from multi_degradation_image_enhancement_tpu.ops.pallas.dense_block import fold_bn
from multi_degradation_image_enhancement_tpu.ops.pallas.dense_block_cm import (
    _run_cm,
    _run_cm2,
    cm2_supported,
    pack_params_cm,
)


def _fold_conv_bn(conv: Dict[str, Any], bn: Dict[str, Any], bn_stats: Dict[str, Any]):
    """Fold inference BN (affine) into the preceding conv's kernel/bias."""
    a, b = fold_bn(bn["scale"], bn["bias"], bn_stats["mean"], bn_stats["var"])
    kernel = conv["kernel"] * a[None, None, None, :]
    bias = conv["bias"] * a + b
    return kernel, bias


def _conv2d(x: jax.Array, kernel: jax.Array, bias: jax.Array, dtype) -> jax.Array:
    y = jax.lax.conv_general_dilated(
        x.astype(dtype),
        kernel.astype(dtype),
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + bias.astype(dtype)


def build_fast_apply(
    variables: Dict[str, Any], dtype=jnp.bfloat16, *, interpret: bool = False
) -> Callable[[jax.Array], jax.Array]:
    """Build the fused inference forward from a canonical CDAN variables tree.

    Returns ``apply_fn(x_nhwc_01) -> restored`` closing over pre-packed
    weights (BN folds + channel-major DenseBlock packs), so repacking never
    happens inside the step.  ``interpret=True`` runs the Pallas kernels in
    interpreter mode (CPU tests).
    """
    params = variables["params"]
    stats = variables["batch_stats"]
    enc_p, enc_s = params["encoder"], stats["encoder"]
    dec_p, dec_s = params["decoder"], stats["decoder"]

    # Encoder ConvBlocks and decoder conv+BN pairs: fold BN into the conv.
    folded: Dict[str, Any] = {}
    for name in ("conv1", "conv2", "conv3", "conv4"):
        folded[name] = _fold_conv_bn(
            enc_p[name]["Conv_0"], enc_p[name]["BatchNorm_0"], enc_s[name]["BatchNorm_0"]
        )
    for name in ("de1", "de2", "de3", "de4"):
        folded[name] = _fold_conv_bn(
            dec_p[f"{name}_conv"], dec_p[f"{name}_bn"], dec_s[f"{name}_bn"]
        )

    # Channel-major packs for the five DenseBlocks.
    db_cfg = {"dense1": 64, "dense2": 128, "dense3": 256, "final_dense": 3}
    db_packed = {
        name: pack_params_cm(
            (enc_p if name.startswith("dense") else dec_p)[name],
            (enc_s if name.startswith("dense") else dec_s)[name],
            c_in,
        )
        for name, c_in in db_cfg.items()
    }

    cbam_mods = {
        "bottleneck": CBAM(512, dtype=dtype),
        "cbam1": CBAM(256, dtype=dtype),
        "cbam2": CBAM(128, dtype=dtype),
        "cbam3": CBAM(64, dtype=dtype),
    }
    cbam_vars = {
        "bottleneck": {"params": params["bottleneck"], "batch_stats": stats["bottleneck"]},
        "cbam1": {"params": dec_p["cbam1"], "batch_stats": dec_s["cbam1"]},
        "cbam2": {"params": dec_p["cbam2"], "batch_stats": dec_s["cbam2"]},
        "cbam3": {"params": dec_p["cbam3"], "batch_stats": dec_s["cbam3"]},
    }

    def conv_relu(x, name):
        k, b = folded[name]
        return nn.relu(_conv2d(x, k, b, dtype))

    def dense_block(x, name, c_in):
        c_out = c_in  # every CDAN DenseBlock is channel-preserving
        bsz, h, w = x.shape[0], x.shape[1], x.shape[2]
        if cm2_supported(h, w, c_in, c_out):
            # Fused-I/O path: one bandwidth-speed transpose each way; halo
            # packing and interior extraction live inside the kernel.
            xcm = x.transpose(0, 3, 1, 2).reshape(bsz, c_in, h * w)
            out_cm = _run_cm2(
                xcm, db_packed[name], c_in=c_in, hw_shape=(h, w), interpret=interpret
            )
            return (
                out_cm[:, :c_out, :].reshape(bsz, c_out, h, w).transpose(0, 2, 3, 1)
            )
        out_cm = _run_cm(x, db_packed[name], c_in=c_in, interpret=interpret)
        return out_cm[:, :c_out, :].transpose(0, 2, 1).reshape(bsz, h, w, c_out)

    def cbam(x, name):
        return cbam_mods[name].apply(cbam_vars[name], x, train=False)

    def apply_fn(x: jax.Array) -> jax.Array:
        x = x.astype(dtype)

        # NOTE: a fused conv1+pool polyphase kernel exists
        # (ops/pallas/conv_pool_cm.py) and wins standalone (4.88 vs 6.29 ms)
        # but measured ~2 ms SLOWER end-to-end here — XLA's cross-op fusion
        # around conv1 (degrade producer, pool consumer) beats the isolated
        # win, so the XLA chain stays (A/B: benchmarks/exp_conv_pool.py,
        # integration numbers in PERF.md).
        out = conv_relu(x, "conv1")
        out = nn.max_pool(out, (2, 2), strides=(2, 2))
        d1 = dense_block(out, "dense1", 64)
        skip0 = out

        out = conv_relu(out, "conv2")
        out = nn.max_pool(out, (2, 2), strides=(2, 2))
        d2 = dense_block(out, "dense2", 128)
        skip1 = out

        out = conv_relu(out, "conv3")
        out = nn.max_pool(out, (2, 2), strides=(2, 2))
        d3 = dense_block(out, "dense3", 256)
        skip2 = out

        out = conv_relu(out, "conv4")
        out = cbam(out, "bottleneck")

        out = conv_relu(out, "de1")
        out = out + skip2
        out = cbam(out, "cbam1")

        out = out * d3
        out = conv_relu(out, "de2")
        out = _bilinear_x2(out)
        out = out + skip1
        out = cbam(out, "cbam2")

        out = out * d2
        out = conv_relu(out, "de3")
        out = _bilinear_x2(out)
        out = out + skip0
        out = cbam(out, "cbam3")

        out = out * d1
        out = conv_relu(out, "de4")
        out = _bilinear_x2(out)
        out = out + x  # global residual

        out = dense_block(out, "final_dense", 3)
        return jax.nn.sigmoid(out).astype(jnp.float32)

    return apply_fn
