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
from multi_degradation_image_enhancement_tpu.ops.pallas.conv_cm import (
    conv3x3_cm,
    conv_supported,
    pack_conv,
)
from multi_degradation_image_enhancement_tpu.ops.pallas.conv_pool_cm import (
    conv3x3_pool_cm,
    conv_pool_supported,
    deinterleave_cols,
    pack_conv_pool,
)
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


def _fold_all(variables: Dict[str, Any]) -> Dict[str, Any]:
    """BN-fold every conv+BN pair of the canonical CDAN tree (shared by both
    serving builders)."""
    params = variables["params"]
    stats = variables["batch_stats"]
    enc_p, enc_s = params["encoder"], stats["encoder"]
    dec_p, dec_s = params["decoder"], stats["decoder"]
    folded: Dict[str, Any] = {}
    for name in ("conv1", "conv2", "conv3", "conv4"):
        folded[name] = _fold_conv_bn(
            enc_p[name]["Conv_0"], enc_p[name]["BatchNorm_0"], enc_s[name]["BatchNorm_0"]
        )
    for name in ("de1", "de2", "de3", "de4"):
        folded[name] = _fold_conv_bn(
            dec_p[f"{name}_conv"], dec_p[f"{name}_bn"], dec_s[f"{name}_bn"]
        )
    return folded


def _pack_dense_blocks(variables: Dict[str, Any]) -> Dict[str, Any]:
    params = variables["params"]
    stats = variables["batch_stats"]
    enc_p, enc_s = params["encoder"], stats["encoder"]
    dec_p, dec_s = params["decoder"], stats["decoder"]
    db_cfg = {"dense1": 64, "dense2": 128, "dense3": 256, "final_dense": 3}
    return {
        name: pack_params_cm(
            (enc_p if name.startswith("dense") else dec_p)[name],
            (enc_s if name.startswith("dense") else dec_s)[name],
            c_in,
        )
        for name, c_in in db_cfg.items()
    }


def pack_cbam_cm(params: Dict[str, Any], stats: Dict[str, Any]) -> Dict[str, jax.Array]:
    """Extract + fold one CBAM's weights for the channel-major apply.

    Channel gate: shared MLP (fc1/fc2 Dense, reference ``models/cbam.py:37-60``)
    applied to avg- and max-pooled channel vectors.  Spatial gate: 7×7 conv
    (no bias) + BN (reference ``:68-82``) — the inference BN folds into the
    conv kernel and one scalar bias.
    """
    cg = params["ChannelGate_0"]
    sp = params["SpatialGate_0"]["spatial"]
    st = stats["SpatialGate_0"]["spatial"]["BatchNorm_0"]
    a, b = fold_bn(sp["BatchNorm_0"]["scale"], sp["BatchNorm_0"]["bias"], st["mean"], st["var"])
    return {
        "w1": cg["fc1"]["kernel"],
        "b1": cg["fc1"]["bias"],
        "w2": cg["fc2"]["kernel"],
        "b2": cg["fc2"]["bias"],
        "k7": sp["Conv_0"]["kernel"] * a,  # [7,7,2,1], BN scale folded in
        "bsp": b,  # [1] folded BN bias
    }


def _cbam_cm(x: jax.Array, pack: Dict[str, jax.Array], hw_shape, dtype) -> jax.Array:
    """CBAM on a channel-major ``[B, C, H·W]`` activation (inference).

    Same math as ``models.cbam.CBAM(...).apply(..., train=False)`` with the
    default avg+max pools, computed without leaving the CM layout: channel
    pools reduce the lane axis, the gate MLP is a tiny matmul, the spatial
    7×7 conv runs as an NCHW ``conv_general_dilated`` on the 2-channel
    compress map.
    """
    bsz, c, hw = x.shape
    h, w = hw_shape
    avg = jnp.mean(x, axis=2)
    mx = jnp.max(x, axis=2)

    def mlp(v):
        hdn = jnp.maximum(v @ pack["w1"].astype(dtype) + pack["b1"].astype(dtype), 0)
        return hdn @ pack["w2"].astype(dtype) + pack["b2"].astype(dtype)

    scale = jax.nn.sigmoid(mlp(avg) + mlp(mx))[:, :, None]
    x = x * scale

    # Spatial gate on the 2-channel compress map.  The map is tiny (2·H·W),
    # so transpose it to NHWC for the 7×7 conv — an NCHW conv at C=2 pays
    # XLA's channel-padding tax (measured +2.5 ms/step across the 4 CBAMs).
    comp = jnp.stack([jnp.max(x, axis=1), jnp.mean(x, axis=1)], axis=-1)  # [B,HW,2]
    att = jax.lax.conv_general_dilated(
        comp.reshape(bsz, h, w, 2).astype(dtype),
        pack["k7"].astype(dtype),
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ).reshape(bsz, 1, hw) + pack["bsp"].astype(dtype)
    return x * jax.nn.sigmoid(att)


def _conv_cm_xla(
    x_cm: jax.Array, packed: Dict[str, jax.Array], hw_shape, *, relu: bool = True
) -> jax.Array:
    """XLA NCHW 3×3 conv on a channel-major activation, from the same packed
    weights as :func:`ops.pallas.conv_cm.conv3x3_cm` (kernel reconstructed by
    inverting ``pack_conv``'s (dy, c_out)-row layout)."""
    b, c_in, hw = x_cm.shape
    h, w = hw_shape
    c_outp = packed["bias"].shape[0]
    k = packed["A"].reshape(3, c_outp, 3, c_in).transpose(0, 2, 3, 1)  # HWIO
    y = jax.lax.conv_general_dilated(
        x_cm.reshape(b, c_in, h, w),
        k.astype(x_cm.dtype),
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NCHW", "HWIO", "NCHW"),
    ) + packed["bias"].astype(x_cm.dtype)[None, :, :, None]  # [1,c_outp,1,1]
    if relu:
        y = jnp.maximum(y, 0)
    return y.reshape(b, c_outp, hw)


# Per-layer conv implementation for the all-CM forward ("pallas" = the CM
# Pallas kernel, "xla" = NCHW conv_general_dilated).  Defaults follow the
# in-context A/B in PERF.md; benchmarks patch this table to re-measure.
_CM_CONV_IMPL: Dict[str, str] = {
    "conv2": "xla",
    "conv3": "xla",
    "conv4": "xla",
    "de1": "xla",
    "de2": "xla",
    "de3": "xla",
    "de4": "xla",
}

# Run the DenseBlock kernels' per-layer affine+ReLU+mask in bf16 instead of
# f32 (the matmuls already consume bf16; their accumulate stays f32 either
# way).  Captured at build time; benchmarks patch it to A/B.
_DB_BF16_ACT = False

# K-stack width for the DenseBlock kernels' tiny-K growth layers (None =
# kernel default, 0 = pure roll-after-matmul).  Captured at build time;
# benchmarks patch it to A/B (see ops/pallas/dense_block_cm._K_STACK_MAX_CI).
_DB_K_STACK_MAX_CI = None

# NHWC fused-I/O DenseBlocks: feed the kernels the flattened NHWC operand
# (free reshape) and run the CM transposes in VMEM as identity matmuls,
# deleting the XLA boundary transposes entirely for the c ≥ 64 blocks
# (dense1/2/3; final_dense stays CM — its c=3 NHWC block would pay 42×
# lane padding).  Captured at build time; benchmarks patch it to A/B.
_DB_NHWC_IO = False


def _load_serving_tuning() -> None:
    """Apply measured serving-variant defaults from ``config/serving_tuning.json``.

    ``benchmarks/tune_serving.py`` measures the kernel-variant combos on the
    real chip and persists the winner, so the production defaults track
    hardware measurements without a code edit (the module constants above
    remain patchable for A/Bs).  Override the path with
    ``MDIE_SERVING_TUNING``; a missing file keeps the conservative defaults.
    """
    import json
    import os

    global _DB_BF16_ACT, _DB_K_STACK_MAX_CI, _SERVING_PREFER_CM, _DB_NHWC_IO
    path = os.environ.get(
        "MDIE_SERVING_TUNING",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "config",
            "serving_tuning.json",
        ),
    )
    if not os.path.isfile(path):
        return
    try:
        with open(path) as f:
            cfg = json.load(f)
    except Exception:
        return
    _DB_BF16_ACT = bool(cfg.get("db_bf16_act", _DB_BF16_ACT))
    if "db_k_stack_max_ci" in cfg:
        _DB_K_STACK_MAX_CI = cfg["db_k_stack_max_ci"]
    if "prefer_cm" in cfg:
        _SERVING_PREFER_CM = bool(cfg["prefer_cm"])
    if "db_nhwc_io" in cfg:
        _DB_NHWC_IO = bool(cfg["db_nhwc_io"])


def _maxpool2x2_cm(x: jax.Array, hw_shape) -> jax.Array:
    """2×2 max-pool on channel-major ``[B, C, H·W]`` (stride-2 lane max)."""
    b, c, hw = x.shape
    h, w = hw_shape
    x4 = x.reshape(b, c, h // 2, 2, w // 2, 2)
    return jnp.max(x4, axis=(3, 5)).reshape(b, c, hw // 4)


def _upsample_x2_cm(x: jax.Array, hw_shape) -> jax.Array:
    """×2 half-pixel bilinear upsample on channel-major ``[B, C, H·W]``."""
    b, c, hw = x.shape
    h, w = hw_shape
    y = jax.image.resize(x.reshape(b, c, h, w), (b, c, 2 * h, 2 * w), method="bilinear")
    return y.reshape(b, c, 4 * hw)


def build_fast_apply_cm(
    variables: Dict[str, Any], dtype=jnp.bfloat16, *, interpret: bool = False
) -> Callable[[jax.Array], jax.Array]:
    """All-channel-major fused inference forward.

    Every activation between the input transpose and the output transpose
    stays ``[B, C, H·W]``: the five DenseBlocks and all eight 3×3 convs run
    through the channel-major Pallas kernels (conv1 fused with its 2×2 pool
    via the polyphase kernel), CBAM/pool/upsample run as CM-native XLA ops —
    so the per-DenseBlock NHWC↔CM boundary transposes of
    :func:`build_fast_apply` (≈5 ms/step at B=128·256², PERF.md) disappear.

    Topology parity: reference ``/root/reference/models/cdan.py:55-159``.
    Numerical contract: equals the canonical module apply to bf16 tolerance
    (``tests/test_cdan_fast.py``).
    """
    params = variables["params"]
    stats = variables["batch_stats"]
    dec_p, dec_s = params["decoder"], stats["decoder"]

    folded = _fold_all(variables)
    db_packed = _pack_dense_blocks(variables)

    conv1_pack = pack_conv_pool(*folded["conv1"])
    conv_packs = {name: pack_conv(*folded[name]) for name in
                  ("conv2", "conv3", "conv4", "de1", "de2", "de3", "de4")}

    cbam_packs = {
        "bottleneck": pack_cbam_cm(params["bottleneck"], stats["bottleneck"]),
        "cbam1": pack_cbam_cm(dec_p["cbam1"], dec_s["cbam1"]),
        "cbam2": pack_cbam_cm(dec_p["cbam2"], dec_s["cbam2"]),
        "cbam3": pack_cbam_cm(dec_p["cbam3"], dec_s["cbam3"]),
    }

    def conv(x_cm, name, hw):
        if _CM_CONV_IMPL.get(name, "pallas") == "xla":
            return _conv_cm_xla(x_cm, conv_packs[name], hw)
        return conv3x3_cm(x_cm, conv_packs[name], hw_shape=hw, interpret=interpret)

    bf16_act = _DB_BF16_ACT
    k_stack = _DB_K_STACK_MAX_CI

    def dense_block(x_cm, name, c_in, hw):
        out = _run_cm2(
            x_cm, db_packed[name], c_in=c_in, hw_shape=hw,
            bf16_act=bf16_act, k_stack_max_ci=k_stack, interpret=interpret,
        )
        return out  # [B, ceil16(c_out), HW]

    def cbam(x_cm, name, hw):
        return _cbam_cm(x_cm, cbam_packs[name], hw, dtype)

    def apply_fn(x: jax.Array) -> jax.Array:
        bsz, h0, w0, _ = x.shape
        x_cm = x.transpose(0, 3, 1, 2).reshape(bsz, 3, h0 * w0).astype(dtype)

        # conv1 + 2×2 pool in one polyphase pass (3→64, ch padded to 8)
        x8 = jnp.pad(x_cm, ((0, 0), (0, 5), (0, 0)))
        out = conv3x3_pool_cm(
            deinterleave_cols(x8, (h0, w0)), conv1_pack, hw_shape=(h0, w0),
            interpret=interpret,
        )
        h, w = h0 // 2, w0 // 2
        d1 = dense_block(out, "dense1", 64, (h, w))
        skip0 = out

        out = conv(out, "conv2", (h, w))
        out = _maxpool2x2_cm(out, (h, w))
        h, w = h // 2, w // 2
        d2 = dense_block(out, "dense2", 128, (h, w))
        skip1 = out

        out = conv(out, "conv3", (h, w))
        out = _maxpool2x2_cm(out, (h, w))
        h, w = h // 2, w // 2
        d3 = dense_block(out, "dense3", 256, (h, w))
        skip2 = out

        out = conv(out, "conv4", (h, w))
        out = cbam(out, "bottleneck", (h, w))

        out = conv(out, "de1", (h, w))
        out = out + skip2
        out = cbam(out, "cbam1", (h, w))

        out = out * d3
        out = conv(out, "de2", (h, w))
        out = _upsample_x2_cm(out, (h, w))
        h, w = 2 * h, 2 * w
        out = out + skip1
        out = cbam(out, "cbam2", (h, w))

        out = out * d2
        out = conv(out, "de3", (h, w))
        out = _upsample_x2_cm(out, (h, w))
        h, w = 2 * h, 2 * w
        out = out + skip0
        out = cbam(out, "cbam3", (h, w))

        out = out * d1
        out = conv(out, "de4", (h, w))[:, :3, :]  # c_out=3 padded to 16 — slice
        out = _upsample_x2_cm(out, (h, w))
        h, w = 2 * h, 2 * w
        out = out + x_cm  # global residual

        out = dense_block(out, "final_dense", 3, (h, w))[:, :3, :]
        out = jax.nn.sigmoid(out)
        return out.reshape(bsz, 3, h, w).transpose(0, 2, 3, 1).astype(jnp.float32)

    return apply_fn


def cm_forward_supported(h: int, w: int) -> bool:
    """Whether every kernel in the all-CM forward admits this image size."""
    grids = {  # layer -> (h, w, c_in, c_out) per conv call
        "conv2": (h // 2, w // 2, 64, 128),
        "conv3": (h // 4, w // 4, 128, 256),
        "conv4": (h // 8, w // 8, 256, 512),
        "de1": (h // 8, w // 8, 512, 256),
        "de2": (h // 8, w // 8, 256, 128),
        "de3": (h // 4, w // 4, 128, 64),
        "de4": (h // 2, w // 2, 64, 3),
    }
    dbs = [(h // 2, w // 2, 64, 64), (h // 4, w // 4, 128, 128),
           (h // 8, w // 8, 256, 256), (h, w, 3, 3)]
    return (
        h % 8 == 0
        and w % 16 == 0
        and conv_pool_supported(h, w, 8, 64)
        and all(
            conv_supported(*g)
            for name, g in grids.items()
            if _CM_CONV_IMPL.get(name, "pallas") == "pallas"
        )
        and all(cm2_supported(*g) for g in dbs)
    )


def build_serving_apply(
    variables: Dict[str, Any], dtype=jnp.bfloat16, *, interpret: bool = False
) -> Callable[[jax.Array], jax.Array]:
    """Serving forward with per-shape dispatch: the all-channel-major path
    (:func:`build_fast_apply_cm`) whenever the traced image size admits every
    CM kernel, else the per-DenseBlock fused path (:func:`build_fast_apply`).

    Shape inspection happens at trace time (shapes are static under jit), so
    a jitted caller pays zero runtime dispatch cost.
    """
    cm_fn = build_fast_apply_cm(variables, dtype, interpret=interpret)
    v1_fn = build_fast_apply(variables, dtype, interpret=interpret)

    def apply_fn(x: jax.Array) -> jax.Array:
        _, h, w, _ = x.shape
        if _SERVING_PREFER_CM and cm_forward_supported(h, w):
            return cm_fn(x)
        return v1_fn(x)

    return apply_fn


# Measured A/B at B=128·256² (PERF.md round 3): the all-CM forward currently
# trails the per-DenseBlock fused path (43.5 vs 40.8 ms) — XLA's NCHW convs
# and the CM entry glue give back more than the DB boundary transposes save.
# The CM path stays built/tested; flip when its conv kernels beat XLA NHWC.
_SERVING_PREFER_CM = False


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

    bf16_act = _DB_BF16_ACT
    k_stack = _DB_K_STACK_MAX_CI
    nhwc_io = _DB_NHWC_IO

    def dense_block(x, name, c_in):
        c_out = c_in  # every CDAN DenseBlock is channel-preserving
        bsz, h, w = x.shape[0], x.shape[1], x.shape[2]
        if nhwc_io and cm2_supported(h, w, c_in, c_out, nhwc_io=True):
            # Transpose-free path: flattened-NHWC operand in and out (free
            # reshapes); the CM transposes ride the MXU inside the kernel.
            out2 = _run_cm2(
                x.reshape(bsz, h * w, c_in), db_packed[name], c_in=c_in,
                hw_shape=(h, w), bf16_act=bf16_act, k_stack_max_ci=k_stack,
                nhwc_io=True, interpret=interpret,
            )
            return out2[:, :, :c_out].reshape(bsz, h, w, c_out)
        if cm2_supported(h, w, c_in, c_out):
            # Fused-I/O path: one bandwidth-speed transpose each way; halo
            # packing and interior extraction live inside the kernel.
            xcm = x.transpose(0, 3, 1, 2).reshape(bsz, c_in, h * w)
            out_cm = _run_cm2(
                xcm, db_packed[name], c_in=c_in, hw_shape=(h, w),
                bf16_act=bf16_act, k_stack_max_ci=k_stack, interpret=interpret,
            )
            return (
                out_cm[:, :c_out, :].reshape(bsz, c_out, h, w).transpose(0, 2, 3, 1)
            )
        out_cm = _run_cm(x, db_packed[name], c_in=c_in, bf16_act=bf16_act,
                         k_stack_max_ci=k_stack, interpret=interpret)
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


_load_serving_tuning()
