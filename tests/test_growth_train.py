"""Trainable fused DenseBlock growth layer (custom VJP) — correctness.

Covers VERDICT r2 item 2's "gradient-equivalence test vs the XLA path":
the Pallas forward/backward against jax autodiff of a pure-XLA reference,
and the fused DenseBlock module against the canonical Flax module
(identical variable tree, identical stats updates, bf16-class gradients).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multi_degradation_image_enhancement_tpu.models.cdan import DenseBlock
from multi_degradation_image_enhancement_tpu.ops.pallas.growth_train import (
    _ceil16,
    growth_layer_cm,
    growth_supported,
    pack_growth,
)


def _ref_layer(x_cm, a, b, kernel, bias, hw_shape):
    B, c, HW = x_cm.shape
    h, w = hw_shape
    x = x_cm.reshape(B, c, h, w).transpose(0, 2, 3, 1)
    v = jnp.maximum(x * a + b, 0.0)
    g = (
        jax.lax.conv_general_dilated(
            v, kernel, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        + bias
    )
    return g.transpose(0, 3, 1, 2).reshape(B, 16, HW)


@pytest.mark.parametrize("B,c,h,w", [(2, 19, 8, 16), (4, 3, 8, 8), (1, 64, 16, 16)])
def test_growth_layer_grad_matches_autodiff(B, c, h, w):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, c, h * w), jnp.float32)
    a = jnp.asarray(rng.uniform(0.5, 1.5, c), jnp.float32)
    b = jnp.asarray(rng.randn(c) * 0.1, jnp.float32)
    kernel = jnp.asarray(rng.randn(3, 3, c, 16) * 0.1, jnp.float32)
    bias = jnp.asarray(rng.randn(16) * 0.1, jnp.float32)
    cp = _ceil16(c)
    assert growth_supported(h, w, c)

    def ours(x, a, b, kernel, bias):
        return growth_layer_cm(
            x, a, b, pack_growth(kernel, cp), bias, c, (h, w), True
        )

    g_ref = _ref_layer(x, a, b, kernel, bias, (h, w))
    g_our = ours(x, a, b, kernel, bias)
    scale = float(jnp.abs(g_ref).max())
    assert float(jnp.abs(g_ref - g_our).max()) < 2e-2 * max(scale, 1.0)

    R = jnp.asarray(rng.randn(*g_ref.shape), jnp.float32)
    gr = jax.grad(
        lambda *args: jnp.sum(_ref_layer(*args, (h, w)) * R), argnums=(0, 1, 2, 3, 4)
    )(x, a, b, kernel, bias)
    go = jax.grad(
        lambda *args: jnp.sum(ours(*args) * R), argnums=(0, 1, 2, 3, 4)
    )(x, a, b, kernel, bias)
    for name, r, o in zip(("dx", "da", "db", "dK", "dbias"), gr, go):
        sc = float(jnp.abs(r).max())
        md = float(jnp.abs(r - o).max())
        # bf16 matmuls inside the kernel vs f32 reference: ~0.4%/op class
        assert md < 2e-2 * max(sc, 1.0), f"{name}: {md} vs scale {sc}"


@pytest.mark.parametrize("B,c,h,w", [(2, 19, 8, 16), (4, 3, 8, 8)])
def test_growth_layer_k_stacked_forward(B, c, h, w, monkeypatch):
    """K-stacked forward (one [48,3cp] matmul) matches the tap form and the
    autodiff reference; the backward (unchanged) still agrees."""
    from multi_degradation_image_enhancement_tpu.ops.pallas import growth_train

    rng = np.random.RandomState(9)
    x = jnp.asarray(rng.randn(B, c, h * w), jnp.float32)
    a = jnp.asarray(rng.uniform(0.5, 1.5, c), jnp.float32)
    b = jnp.asarray(rng.randn(c) * 0.1, jnp.float32)
    kernel = jnp.asarray(rng.randn(3, 3, c, 16) * 0.1, jnp.float32)
    bias = jnp.asarray(rng.randn(16) * 0.1, jnp.float32)
    cp = _ceil16(c)

    def ours(x, a, b, kernel, bias):
        return growth_layer_cm(
            x, a, b, pack_growth(kernel, cp), bias, c, (h, w), True
        )

    g_tap = ours(x, a, b, kernel, bias)
    monkeypatch.setattr(growth_train, "_K_STACK_MAX_CI", 48)
    g_stk = ours(x, a, b, kernel, bias)
    # identical bf16 operands either side of the commuted roll: tight bound
    assert float(jnp.abs(g_tap - g_stk).max()) < 1e-2

    R = jnp.asarray(rng.randn(*g_stk.shape), jnp.float32)
    gr = jax.grad(
        lambda *args: jnp.sum(_ref_layer(*args, (h, w)) * R), argnums=(0, 1, 2, 3, 4)
    )(x, a, b, kernel, bias)
    go = jax.grad(
        lambda *args: jnp.sum(ours(*args) * R), argnums=(0, 1, 2, 3, 4)
    )(x, a, b, kernel, bias)
    for name, r, o in zip(("dx", "da", "db", "dK", "dbias"), gr, go):
        sc = float(jnp.abs(r).max())
        assert float(jnp.abs(r - o).max()) < 2e-2 * max(sc, 1.0), name


def test_fused_dense_block_matches_canonical():
    rng = np.random.RandomState(1)
    B, h, w, c = 2, 16, 24, 19
    x = jnp.asarray(rng.rand(B, h, w, c).astype(np.float32))
    m0 = DenseBlock(c)
    m1 = DenseBlock(c, fused=True)
    v0 = m0.init({"params": jax.random.key(0)}, x, train=True)
    v1 = m1.init({"params": jax.random.key(0)}, x, train=True)

    # identical variable tree (checkpoint interchange) and identical init
    eq = jax.tree.map(lambda p, q: bool(jnp.allclose(p, q)), v0, v1)
    assert all(jax.tree.leaves(eq))

    bs = jax.tree.map(
        lambda t: jnp.asarray(rng.uniform(0.5, 1.5, t.shape), t.dtype),
        v0["batch_stats"],
    )
    vars_ = {"params": v0["params"], "batch_stats": bs}

    y0, mut0 = m0.apply(vars_, x, train=True, mutable=["batch_stats"])
    y1, mut1 = m1.apply(vars_, x, train=True, mutable=["batch_stats"])
    assert float(jnp.abs(y0 - y1).max()) < 5e-2
    sd = jax.tree.map(lambda p, q: float(jnp.abs(p - q).max()), mut0, mut1)
    assert max(jax.tree.leaves(sd)) < 1e-3  # running-stat updates match

    e0 = m0.apply(vars_, x, train=False)
    e1 = m1.apply(vars_, x, train=False)
    assert float(jnp.abs(e0 - e1).max()) < 5e-2


def test_fused_dense_block_gradient_class():
    """Fused-path gradients sit at bf16-class distance from the f32 canonical
    path — same class as the canonical module itself run at dtype=bf16."""
    rng = np.random.RandomState(2)
    B, h, w, c = 2, 16, 24, 19
    x = jnp.asarray(rng.rand(B, h, w, c).astype(np.float32))
    m_f32 = DenseBlock(c)
    m_bf16 = DenseBlock(c, dtype=jnp.bfloat16)
    m_fused = DenseBlock(c, fused=True)
    v0 = m_f32.init({"params": jax.random.key(0)}, x, train=True)
    bs = jax.tree.map(
        lambda t: jnp.asarray(rng.uniform(0.5, 1.5, t.shape), t.dtype),
        v0["batch_stats"],
    )
    R = jnp.asarray(rng.randn(B, h, w, c), jnp.float32)

    def gradfn(m):
        def f(p):
            out, _ = m.apply(
                {"params": p, "batch_stats": bs}, x, train=True,
                mutable=["batch_stats"],
            )
            return jnp.sum(out.astype(jnp.float32) * R)

        return jax.grad(f)

    gf = gradfn(m_f32)(v0["params"])
    gb = gradfn(m_bf16)(v0["params"])
    gu = gradfn(m_fused)(v0["params"])

    def worst_rel(gref, gother):
        worst = 0.0
        for path, p in jax.tree_util.tree_flatten_with_path(gref)[0]:
            q = gother
            for k in path:
                q = q[k.key]
            sc = float(jnp.abs(p).max())
            if sc < 1e-3:  # conv biases pre-BN: mathematically zero
                continue
            worst = max(worst, float(jnp.abs(p - q).max()) / sc)
        return worst

    noise_floor = worst_rel(gf, gb)  # canonical's own bf16 noise
    fused_err = worst_rel(gf, gu)
    assert fused_err < max(2.0 * noise_floor, 0.05), (fused_err, noise_floor)


def test_fused_flag_falls_back_on_unsupported_grid():
    """growth_rate ≠ 16 must route to the canonical branch, same tree."""
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.rand(1, 8, 8, 8).astype(np.float32))
    m = DenseBlock(8, growth_rate=8, fused=True)
    v = m.init({"params": jax.random.key(0)}, x, train=False)
    out = m.apply(v, x, train=False)
    assert out.shape == x.shape


@pytest.mark.slow
def test_fused_cdan_matches_canonical_full_model():
    """CDAN(fused_dense=True) vs canonical CDAN — one whole-network check.

    The DB-level tests above bound per-block error; this covers the
    integration the engine actually runs (``train.fused_dense``): encoder
    dense gates computed fused then *multiplied* into the decoder, the
    final 3-channel DenseBlock at full resolution, shared dropout streams,
    and the running-stat updates of all eight fused blocks.  A wiring bug
    (wrong gate, wrong stat concat order) shows up as O(1) divergence;
    bf16-class kernel noise stays well under the tolerances.
    """
    from multi_degradation_image_enhancement_tpu.models.cdan import CDAN

    rng = np.random.RandomState(4)
    B, h, w = 2, 16, 24
    x = jnp.asarray(rng.rand(B, h, w, 3).astype(np.float32))

    m0 = CDAN()
    m1 = CDAN(fused_dense=True)
    v = m0.init({"params": jax.random.key(0), "dropout": jax.random.key(1)}, x, train=True)
    v1 = m1.init({"params": jax.random.key(0), "dropout": jax.random.key(1)}, x, train=True)
    eq = jax.tree.map(lambda p, q: bool(jnp.allclose(p, q)), v, v1)
    assert all(jax.tree.leaves(eq))  # identical tree: checkpoints interchange

    bs = jax.tree.map(
        lambda t: jnp.asarray(rng.uniform(0.5, 1.5, t.shape), t.dtype),
        v["batch_stats"],
    )
    vars_ = {"params": v["params"], "batch_stats": bs}
    kw = dict(train=True, mutable=["batch_stats"], rngs={"dropout": jax.random.key(2)})

    y0, mut0 = m0.apply(vars_, x, **kw)
    y1, mut1 = m1.apply(vars_, x, **kw)
    assert y0.shape == y1.shape == x.shape
    # post-sigmoid outputs in [0,1]: gate/wiring bugs are O(1), kernel noise ≪
    assert float(jnp.abs(y0 - y1).max()) < 0.1
    sd = jax.tree.map(lambda p, q: float(jnp.abs(p - q).max()), mut0, mut1)
    assert max(jax.tree.leaves(sd)) < 5e-2

    # eval mode (running stats, no dropout): the serving-weight contract
    e0 = m0.apply(vars_, x, train=False)
    e1 = m1.apply(vars_, x, train=False)
    assert float(jnp.abs(e0 - e1).max()) < 0.1

    # gradient class on the loss the engine trains with (MSE to a target):
    # relative distance per leaf, skipping mathematically-zero leaves
    t = jnp.asarray(rng.rand(B, h, w, 3).astype(np.float32))

    def gradfn(m):
        def f(p):
            out, _ = m.apply({"params": p, "batch_stats": bs}, x, **kw)
            return jnp.mean((out.astype(jnp.float32) - t) ** 2)

        return jax.grad(f)(v["params"])

    g0 = gradfn(m0)
    g1 = gradfn(m1)
    gb = gradfn(CDAN(dtype=jnp.bfloat16))  # canonical bf16: the noise floor

    def worst_rel(gother):
        worst = 0.0
        for path, p in jax.tree_util.tree_flatten_with_path(g0)[0]:
            q = gother
            for k in path:
                q = q[k.key]
            sc = float(jnp.abs(p).max())
            # conv biases feeding straight into BatchNorm have mathematically
            # zero gradient (a constant shift cancels in the normalization);
            # their ~1e-10 numerical dust would dominate a relative metric.
            if sc < 1e-4:
                continue
            worst = max(worst, float(jnp.abs(p - q).max()) / sc)
        return worst

    # The fused kernels compute in bf16; through 4 dense gates (multiplied
    # into the decoder) that noise amplifies the same way the canonical
    # model's own bf16 mode does — so the floor is measured, not guessed
    # (measured here: fused ≈0.22 vs canonical-bf16 floor of similar class).
    noise_floor = worst_rel(gb)
    fused_err = worst_rel(g1)
    assert fused_err < max(2.0 * noise_floor, 0.1), (fused_err, noise_floor)


def test_growth_supported_backward_vmem_gate():
    """Whole-image packing must be rejected for shapes whose BACKWARD
    kernel cannot compile (Mosaic scoped-VMEM cap), per-dtype.

    Anchor: c_in=51 @ 256x256 bf16 measured 123.27 MiB scoped (> the
    110 MiB cap) on v5e — the shape that crashed the fused b128 train-step
    compile (HTTP 500 from the remote compile helper) before the mode
    planner modeled the backward.  In training the DB input is f32
    (train-mode BatchNorm runs f32), which is strictly larger.  These
    shapes now resolve to row-tiling instead (see
    test_mode_rows_picks_tiling_where_whole_image_cannot_compile).
    """
    from multi_degradation_image_enhancement_tpu.ops.pallas.growth_train import (
        _mode_rows,
    )

    # the measured-OOM shape: whole-image packing rejected at bf16 and f32
    assert _mode_rows(256, 256, 51, 2, forward=False) != 0
    assert _mode_rows(256, 256, 51, 4, forward=False) != 0
    # final_dense first layers at 256x256 keep whole-image mode even in f32
    assert _mode_rows(256, 256, 3, 4, forward=False) == 0
    assert _mode_rows(256, 256, 19, 4, forward=False) == 0
    # encoder dense blocks at the reference recipe shapes fit whole in f32
    # (dense1 widest layer @128x192, dense2 @64x96, dense3 @32x48)
    assert _mode_rows(128, 192, 112, 4, forward=False) == 0
    assert _mode_rows(64, 96, 176, 4, forward=False) == 0
    assert _mode_rows(32, 48, 304, 4, forward=False) == 0
    # final_dense at the 256x384 recipe resolution cannot pack whole (this
    # is why the b16 256x384 profile compiled while b128 256x256 crashed:
    # the old forward-biased gate rejected the former's L, passed the
    # latter's) — and the gate itself now says yes via tiling
    assert _mode_rows(256, 384, 51, 4, forward=False) != 0
    assert growth_supported(256, 384, 51, itemsize=4)


@pytest.mark.parametrize("B,c,h,w,rows", [(2, 19, 12, 16, 3), (1, 3, 8, 8, 2), (2, 35, 8, 16, 4)])
def test_growth_layer_tiled_grad_matches_autodiff(B, c, h, w, rows):
    """Row-tiled fwd/bwd (the VMEM-cap escape for big grids) must match the
    whole-image math exactly: interior masking partitions each pixel's
    contribution across tiles, zero-padded halos reproduce SAME padding at
    the image top/bottom, and wrap-around rolls only touch discarded rows."""
    from multi_degradation_image_enhancement_tpu.ops.pallas import growth_train

    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(B, c, h * w), jnp.float32)
    a = jnp.asarray(rng.uniform(0.5, 1.5, c), jnp.float32)
    b = jnp.asarray(rng.randn(c) * 0.1, jnp.float32)
    kernel = jnp.asarray(rng.randn(3, 3, c, 16) * 0.1, jnp.float32)
    bias = jnp.asarray(rng.randn(16) * 0.1, jnp.float32)
    cp = _ceil16(c)

    def ours(x, a, b, kernel, bias):
        return growth_layer_cm(
            x, a, b, pack_growth(kernel, cp), bias, c, (h, w), True
        )

    old = growth_train._FORCE_TILE_ROWS
    growth_train._FORCE_TILE_ROWS = rows
    try:
        g_ref = _ref_layer(x, a, b, kernel, bias, (h, w))
        g_our = ours(x, a, b, kernel, bias)
        scale = float(jnp.abs(g_ref).max())
        assert float(jnp.abs(g_ref - g_our).max()) < 2e-2 * max(scale, 1.0)

        R = jnp.asarray(rng.randn(*g_ref.shape), jnp.float32)
        gr = jax.grad(
            lambda *args: jnp.sum(_ref_layer(*args, (h, w)) * R),
            argnums=(0, 1, 2, 3, 4),
        )(x, a, b, kernel, bias)
        go = jax.grad(
            lambda *args: jnp.sum(ours(*args) * R), argnums=(0, 1, 2, 3, 4)
        )(x, a, b, kernel, bias)
        for p, q in zip(gr, go):
            sc = max(float(jnp.abs(p).max()), 1.0)
            assert float(jnp.abs(p - q).max()) < 3e-2 * sc, (p.shape, float(jnp.abs(p - q).max()), sc)
    finally:
        growth_train._FORCE_TILE_ROWS = old


def test_mode_rows_picks_tiling_where_whole_image_cannot_compile():
    from multi_degradation_image_enhancement_tpu.ops.pallas.growth_train import (
        _mode_rows,
    )

    # the measured-OOM whole-image shape now resolves to a row-tile…
    assert _mode_rows(256, 256, 51, 4, forward=False) > 0
    assert _mode_rows(256, 384, 51, 4, forward=False) > 0
    # …so the gate accepts final_dense at both recipe resolutions
    assert growth_supported(256, 256, 51, itemsize=4)
    assert growth_supported(256, 384, 51, itemsize=4)
    # small shapes keep whole-image packing (no tiling overhead)
    assert _mode_rows(32, 48, 51, 4, forward=False) == 0
