"""Pallas fused DenseBlock kernel vs the Flax module (interpreter mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multi_degradation_image_enhancement_tpu.models.cdan import DenseBlock
from multi_degradation_image_enhancement_tpu.ops.pallas.dense_block import (
    fold_bn,
    fused_dense_block,
)


@pytest.mark.parametrize("c_in,h,w", [(64, 32, 48), (3, 16, 24), (128, 16, 24)])
def test_fused_dense_block_matches_module(c_in, h, w):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, h, w, c_in), jnp.float32)
    m = DenseBlock(c_in)
    v = m.init({"params": jax.random.key(0)}, x, train=False)
    # randomized running stats so the BN folding is actually exercised
    bs = jax.tree.map(
        lambda t: jnp.asarray(rng.uniform(0.5, 1.5, t.shape), t.dtype), v["batch_stats"]
    )
    variables = {"params": v["params"], "batch_stats": bs}
    ref = m.apply(variables, x, train=False)
    got = fused_dense_block(x, variables["params"], variables["batch_stats"], interpret=True)
    assert got.shape == ref.shape
    # kernel computes features in bf16 (matching the bf16 production forward)
    assert float(jnp.abs(ref - got).max()) < 5e-2
    assert float(jnp.abs(ref - got).mean()) < 5e-3


def test_fused_dense_block_dense_activations_hard_case():
    """Default (identity) BN stats keep activations dense — the case that
    exposed the halo-contamination bug (relu(affine(0)) ≠ 0)."""
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.rand(1, 24, 16, 64), jnp.float32)
    m = DenseBlock(64)
    v = m.init({"params": jax.random.key(0)}, x, train=False)
    ref = m.apply(v, x, train=False)
    got = fused_dense_block(x, v["params"], v["batch_stats"], interpret=True)
    assert float(jnp.abs(ref - got).max()) < 5e-2


@pytest.mark.parametrize("c_in,h,w", [(64, 32, 48), (3, 16, 24), (128, 16, 24)])
def test_cm_dense_block_matches_module(c_in, h, w):
    """Channel-major kernel (the production serving path) vs the Flax module."""
    from multi_degradation_image_enhancement_tpu.ops.pallas.dense_block_cm import (
        fused_dense_block_cm,
    )

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, h, w, c_in), jnp.float32)
    m = DenseBlock(c_in)
    v = m.init({"params": jax.random.key(0)}, x, train=False)
    bs = jax.tree.map(
        lambda t: jnp.asarray(rng.uniform(0.5, 1.5, t.shape), t.dtype), v["batch_stats"]
    )
    variables = {"params": v["params"], "batch_stats": bs}
    ref = m.apply(variables, x, train=False)
    got = fused_dense_block_cm(x, v["params"], bs, interpret=True)
    assert got.shape == ref.shape
    assert float(jnp.abs(ref - got).max()) < 5e-2
    assert float(jnp.abs(ref - got).mean()) < 5e-3


@pytest.mark.parametrize("c_in,h,w", [(64, 32, 48), (3, 16, 24), (128, 16, 24)])
def test_cm2_fused_io_matches_module(c_in, h, w):
    """Fused-I/O channel-major kernel ([B,C,HW] operands, in-kernel halo
    packing) vs the Flax module — the serving path's default when the grid
    fits packed mode."""
    from multi_degradation_image_enhancement_tpu.ops.pallas.dense_block_cm import (
        _run_cm2,
        cm2_supported,
        pack_params_cm,
    )

    assert cm2_supported(h, w, c_in, c_in)
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.rand(2, h, w, c_in), jnp.float32)
    m = DenseBlock(c_in)
    v = m.init({"params": jax.random.key(0)}, x, train=False)
    bs = jax.tree.map(
        lambda t: jnp.asarray(rng.uniform(0.5, 1.5, t.shape), t.dtype), v["batch_stats"]
    )
    ref = m.apply({"params": v["params"], "batch_stats": bs}, x, train=False)
    packed = pack_params_cm(v["params"], bs, c_in)
    xcm = x.transpose(0, 3, 1, 2).reshape(2, c_in, h * w)
    out_cm = _run_cm2(xcm, packed, c_in=c_in, hw_shape=(h, w), interpret=True)
    got = out_cm[:, :c_in, :].reshape(2, c_in, h, w).transpose(0, 2, 3, 1)
    assert got.shape == ref.shape
    assert float(jnp.abs(ref - got).max()) < 5e-2
    assert float(jnp.abs(ref - got).mean()) < 5e-3


@pytest.mark.parametrize("c_in,h,w", [(64, 32, 48), (128, 16, 24)])
def test_cm2_nhwc_io_matches_module(c_in, h, w):
    """NHWC fused-I/O mode ([B,HW,C] operands, in-kernel identity-matmul
    transposes) vs the Flax module — the transpose-free serving variant for
    the c ≥ 64 DenseBlocks."""
    from multi_degradation_image_enhancement_tpu.ops.pallas.dense_block_cm import (
        _run_cm2,
        cm2_supported,
        pack_params_cm,
    )

    assert cm2_supported(h, w, c_in, c_in, nhwc_io=True)
    assert not cm2_supported(h, w, 3, 3, nhwc_io=True)  # small-c stays CM
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.rand(2, h, w, c_in), jnp.float32)
    m = DenseBlock(c_in)
    v = m.init({"params": jax.random.key(0)}, x, train=False)
    bs = jax.tree.map(
        lambda t: jnp.asarray(rng.uniform(0.5, 1.5, t.shape), t.dtype), v["batch_stats"]
    )
    ref = m.apply({"params": v["params"], "batch_stats": bs}, x, train=False)
    packed = pack_params_cm(v["params"], bs, c_in)
    out2 = _run_cm2(
        x.reshape(2, h * w, c_in), packed, c_in=c_in, hw_shape=(h, w),
        nhwc_io=True, interpret=True,
    )
    got = out2[:, :, :c_in].reshape(2, h, w, c_in)
    assert got.shape == ref.shape
    assert float(jnp.abs(ref - got).max()) < 5e-2
    assert float(jnp.abs(ref - got).mean()) < 5e-3
    # agrees with the CM-operand form to bf16 round-trip noise
    xcm = x.transpose(0, 3, 1, 2).reshape(2, c_in, h * w)
    out_cm = _run_cm2(xcm, packed, c_in=c_in, hw_shape=(h, w), interpret=True)
    got_cm = out_cm[:, : got.shape[-1], :].reshape(2, -1, h, w).transpose(0, 2, 3, 1)
    assert float(jnp.abs(got - got_cm).max()) < 2e-2


@pytest.mark.parametrize("c_in,h,w", [(64, 32, 48), (3, 16, 24)])
def test_cm2_bf16_activate_matches_module(c_in, h, w):
    """bf16 affine+ReLU+mask variant stays inside the kernel's bf16-class
    tolerance vs the Flax module (matmul accumulate is f32 either way)."""
    from multi_degradation_image_enhancement_tpu.ops.pallas.dense_block_cm import (
        _run_cm2,
        pack_params_cm,
    )

    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.rand(2, h, w, c_in), jnp.float32)
    m = DenseBlock(c_in)
    v = m.init({"params": jax.random.key(0)}, x, train=False)
    bs = jax.tree.map(
        lambda t: jnp.asarray(rng.uniform(0.5, 1.5, t.shape), t.dtype), v["batch_stats"]
    )
    ref = m.apply({"params": v["params"], "batch_stats": bs}, x, train=False)
    packed = pack_params_cm(v["params"], bs, c_in)
    xcm = x.transpose(0, 3, 1, 2).reshape(2, c_in, h * w)
    out_cm = _run_cm2(
        xcm, packed, c_in=c_in, hw_shape=(h, w), bf16_act=True, interpret=True
    )
    got = out_cm[:, :c_in, :].reshape(2, c_in, h, w).transpose(0, 2, 3, 1)
    assert float(jnp.abs(ref - got).max()) < 5e-2
    assert float(jnp.abs(ref - got).mean()) < 5e-3


@pytest.mark.parametrize("c_in,h,w,k", [(3, 16, 24, 48), (3, 16, 24, 80), (64, 32, 48, 80)])
def test_cm2_k_stacked_taps_match_module(c_in, h, w, k):
    """K-stacked tiny-K growth layers (one [48,3ci] matmul with input-side
    dx rolls) produce the same DenseBlock as the roll-after-matmul form.
    k=80 forces stacking onto every layer of DB(3) and onto ci∈{64,80} of
    DB(64), covering both the all-stacked and mixed cases."""
    from multi_degradation_image_enhancement_tpu.ops.pallas.dense_block_cm import (
        _run_cm2,
        pack_params_cm,
    )

    rng = np.random.RandomState(11)
    x = jnp.asarray(rng.rand(2, h, w, c_in), jnp.float32)
    m = DenseBlock(c_in)
    v = m.init({"params": jax.random.key(0)}, x, train=False)
    bs = jax.tree.map(
        lambda t: jnp.asarray(rng.uniform(0.5, 1.5, t.shape), t.dtype), v["batch_stats"]
    )
    ref = m.apply({"params": v["params"], "batch_stats": bs}, x, train=False)
    packed = pack_params_cm(v["params"], bs, c_in)
    xcm = x.transpose(0, 3, 1, 2).reshape(2, c_in, h * w)
    out_cm = _run_cm2(
        xcm, packed, c_in=c_in, hw_shape=(h, w), k_stack_max_ci=k, interpret=True
    )
    got = out_cm[:, :c_in, :].reshape(2, c_in, h, w).transpose(0, 2, 3, 1)
    assert float(jnp.abs(ref - got).max()) < 5e-2
    assert float(jnp.abs(ref - got).mean()) < 5e-3
    # and the two kernel forms agree with each other to matmul-order noise
    off = _run_cm2(
        xcm, packed, c_in=c_in, hw_shape=(h, w), k_stack_max_ci=0, interpret=True
    )
    assert float(jnp.abs(out_cm - off).max()) < 2e-2


def test_cm_k_stacked_tiled_mode(monkeypatch):
    """K-stacked layers inside the row-tiled (v1) kernel: force tiling on a
    DB(3) grid so the stacked path runs with halo tiles."""
    from multi_degradation_image_enhancement_tpu.ops.pallas import dense_block_cm

    rng = np.random.RandomState(12)
    x = jnp.asarray(rng.rand(1, 32, 16, 3), jnp.float32)
    m = DenseBlock(3)
    v = m.init({"params": jax.random.key(0)}, x, train=False)
    ref = m.apply(v, x, train=False)
    monkeypatch.setattr(dense_block_cm, "_VMEM_TARGET_BYTES", 300 * 1024)
    monkeypatch.setattr(dense_block_cm, "_K_STACK_MAX_CI", 48)
    plan = dense_block_cm._plan(32, 16, 16, 48)
    assert plan["mode"] == "tiled" and plan["rows"] < 32
    got = dense_block_cm.fused_dense_block_cm(x, v["params"], v["batch_stats"], interpret=True)
    assert float(jnp.abs(ref - got).max()) < 5e-2


def test_cm_dense_block_tiled_mode(monkeypatch):
    """Force the row-tiled blocking (big-grid path) and check halo math."""
    from multi_degradation_image_enhancement_tpu.ops.pallas import dense_block_cm

    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.rand(1, 32, 16, 64), jnp.float32)
    m = DenseBlock(64)
    v = m.init({"params": jax.random.key(0)}, x, train=False)
    ref = m.apply(v, x, train=False)
    # small VMEM target → l_img exceeds it → tiled mode with several tiles
    monkeypatch.setattr(dense_block_cm, "_VMEM_TARGET_BYTES", 300 * 1024)
    plan = dense_block_cm._plan(32, 16, 64)
    assert plan["mode"] == "tiled" and plan["rows"] < 32
    got = dense_block_cm.fused_dense_block_cm(x, v["params"], v["batch_stats"], interpret=True)
    assert float(jnp.abs(ref - got).max()) < 5e-2


@pytest.mark.parametrize("c_in,c_out,h,w,relu", [
    (64, 128, 16, 24, True),
    (128, 64, 16, 24, True),
    (16, 3, 32, 16, False),
])
def test_conv3x3_cm_matches_lax(c_in, c_out, h, w, relu):
    """Channel-major fused conv kernel vs lax.conv_general_dilated."""
    from multi_degradation_image_enhancement_tpu.ops.pallas.conv_cm import (
        conv3x3_cm,
        conv_supported,
        pack_conv,
    )

    assert conv_supported(h, w, c_in, c_out)
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(2, h, w, c_in) * 0.5, jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, c_in, c_out) * 0.1, jnp.float32)
    b = jnp.asarray(rng.randn(c_out) * 0.1, jnp.float32)

    ref = jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    ) + b
    if relu:
        ref = jnp.maximum(ref, 0.0)

    xcm = x.transpose(0, 3, 1, 2).reshape(2, c_in, h * w)
    out = conv3x3_cm(xcm, pack_conv(k, b), hw_shape=(h, w), relu=relu, interpret=True)
    got = out[:, :c_out, :].reshape(2, c_out, h, w).transpose(0, 2, 3, 1)
    assert got.shape == ref.shape
    assert float(jnp.abs(ref - got).max()) < 5e-2
    assert float(jnp.abs(ref - got).mean()) < 5e-3


@pytest.mark.parametrize("c_in,c_out,h,w,batch", [
    (3, 64, 16, 32, 2),
    (8, 16, 8, 16, 3),
    (64, 128, 16, 32, 1),
])
def test_conv3x3_pool_cm_matches_lax(c_in, c_out, h, w, batch):
    """Fused conv+BN+ReLU+2×2-maxpool (column-polyphase) vs the XLA chain."""
    from flax import linen as nn

    from multi_degradation_image_enhancement_tpu.ops.pallas.conv_pool_cm import (
        conv3x3_pool_cm,
        conv_pool_supported,
        deinterleave_cols,
        pack_conv_pool,
    )

    assert conv_pool_supported(h, w, c_in, c_out)
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(batch, h, w, c_in) * 0.5, jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, c_in, c_out) * 0.1, jnp.float32)
    b = jnp.asarray(rng.randn(c_out) * 0.1, jnp.float32)

    y = jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    ) + b
    ref = nn.max_pool(jnp.maximum(y, 0.0), (2, 2), strides=(2, 2))

    xcm = x.transpose(0, 3, 1, 2).reshape(batch, c_in, h * w)
    if c_in % 8:
        xcm = jnp.pad(xcm, ((0, 0), (0, 8 - c_in % 8), (0, 0)))
    xd = deinterleave_cols(xcm, (h, w))
    out = conv3x3_pool_cm(xd, pack_conv_pool(k, b), hw_shape=(h, w), interpret=True)
    got = (
        out[:, :c_out, :].reshape(batch, c_out, h // 2, w // 2).transpose(0, 2, 3, 1)
    )
    assert got.shape == ref.shape
    assert float(jnp.abs(ref - got).max()) < 5e-2
    assert float(jnp.abs(ref - got).mean()) < 5e-3


def test_cm2_vmem_plan_bounds():
    """Packing stays under the measured-safe budget; big single images use
    the raised ceiling (the 96 MiB-packing regression compiled to 156 MB of
    VMEM via register-spill slots — see PERF.md)."""
    from multi_degradation_image_enhancement_tpu.ops.pallas import dense_block_cm as cm

    # 256×384 DB(3): only fits the raised single-image ceiling
    assert cm.cm2_supported(256, 384, 3, 3)
    hw = 256 * 384
    l_img = hw + 2 * cm.HALO_ROWS * 384
    bytes_per_lane = cm._cm2_lane_bytes(3, 16, hw, l_img, 0)
    assert l_img > cm._VMEM_TARGET_BYTES // bytes_per_lane  # needs the ceiling
    assert l_img <= cm._VMEM_TARGET_BYTES_V2 // bytes_per_lane

    # 32² DB(256): packing bounded by the conservative budget (n stays small)
    hw = 32 * 32
    l_img = hw + 2 * cm.HALO_ROWS * 32
    bytes_per_lane = cm._cm2_lane_bytes(256, 256, hw, l_img, cm._K_STACK_MAX_CI)
    n_max = (cm._VMEM_TARGET_BYTES // bytes_per_lane) // l_img
    assert n_max * l_img * bytes_per_lane <= cm._VMEM_TARGET_BYTES
    assert n_max < 32  # the configuration that blew VMEM


def test_fold_bn_math():
    scale = jnp.asarray([2.0]); bias = jnp.asarray([1.0])
    mean = jnp.asarray([0.5]); var = jnp.asarray([4.0])
    a, b = fold_bn(scale, bias, mean, var, eps=0.0)
    x = jnp.asarray([3.0])
    direct = scale * (x - mean) / jnp.sqrt(var) + bias
    assert float(jnp.abs(a * x + b - direct)[0]) < 1e-6


def test_conv3x3_cm_channel_split(monkeypatch):
    """Large-grid c_out-split mode: shrink the VMEM budget so a small shape
    is forced onto the split path, and check exactness vs the XLA conv."""
    from multi_degradation_image_enhancement_tpu.ops.pallas import conv_cm
    from multi_degradation_image_enhancement_tpu.ops.pallas.conv_cm import (
        conv3x3_cm,
        pack_conv,
    )

    h, w, c_in, c_out = 16, 32, 8, 32
    l_img = h * w + 2 * w
    # budget below the unsplit working set but above the half-split one
    budget = (
        conv_cm._bytes_per_lane(c_in, c_out // 2, c_out, h * w, l_img)
        + conv_cm._bytes_per_lane(c_in, c_out, c_out, h * w, l_img)
    ) // 2 * l_img
    monkeypatch.setattr(conv_cm, "_VMEM_TARGET_BYTES", budget)
    assert conv_cm._pick_split(c_out, c_in, h * w, l_img) == 2

    rng = np.random.RandomState(6)
    x = jnp.asarray(rng.randn(3, h, w, c_in) * 0.5, jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, c_in, c_out) * 0.1, jnp.float32)
    b = jnp.asarray(rng.randn(c_out) * 0.1, jnp.float32)
    ref = jnp.maximum(
        jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        + b,
        0.0,
    )
    xcm = x.transpose(0, 3, 1, 2).reshape(3, c_in, h * w)
    out = conv3x3_cm(xcm, pack_conv(k, b), hw_shape=(h, w), interpret=True)
    got = out[:, :c_out, :].reshape(3, c_out, h, w).transpose(0, 2, 3, 1)
    assert float(jnp.abs(ref - got).max()) < 5e-2
