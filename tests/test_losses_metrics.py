"""Loss/metric factories vs torch oracles + pipeline semantics."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from multi_degradation_image_enhancement_tpu.ops.losses import build_loss_pipeline
from multi_degradation_image_enhancement_tpu.ops.metrics import build_metrics_pipeline
from multi_degradation_image_enhancement_tpu.ops.ssim import psnr, ssim


@pytest.fixture(scope="module")
def xy():
    rng = np.random.RandomState(1)
    x = rng.rand(2, 32, 48, 3).astype(np.float32)
    y = rng.rand(2, 32, 48, 3).astype(np.float32)
    return jnp.asarray(x), jnp.asarray(y)


def test_basic_terms_match_torch(xy):
    torch = pytest.importorskip("torch")
    xj, yj = xy
    xt = torch.from_numpy(np.asarray(xj).transpose(0, 3, 1, 2))
    yt = torch.from_numpy(np.asarray(yj).transpose(0, 3, 1, 2))
    pipe = build_loss_pipeline(
        {"enabled": True, "terms": [
            {"name": "mse", "weight": 1.0},
            {"name": "l1", "weight": 2.0},
            {"name": "charbonnier", "weight": 1.0, "args": {"eps": 1e-3}},
        ]}
    )
    res = pipe(xj, targets=yj)
    assert abs(float(res["mse"]) - float(torch.nn.functional.mse_loss(xt, yt))) < 1e-6
    assert abs(float(res["l1"]) - float(torch.nn.functional.l1_loss(xt, yt))) < 1e-6
    d = xt - yt
    charb = float(torch.mean(torch.sqrt(d * d + 1e-6)))
    assert abs(float(res["charbonnier"]) - charb) < 1e-6
    expected_total = float(res["mse"]) + 2.0 * float(res["l1"]) + float(res["charbonnier"])
    assert abs(float(res["total"]) - expected_total) < 1e-5


def test_gradient_l1_matches_torch_sobel(xy):
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    xj, yj = xy
    xt = torch.from_numpy(np.asarray(xj).transpose(0, 3, 1, 2))
    yt = torch.from_numpy(np.asarray(yj).transpose(0, 3, 1, 2))

    kx = torch.tensor([[-1.0, 0, 1], [-2, 0, 2], [-1, 0, 1]])
    ky = torch.tensor([[-1.0, -2, -1], [0, 0, 0], [1, 2, 1]])
    K = torch.stack([kx, ky], 0).unsqueeze(1)

    def grads(t):
        b, c, h, w = t.shape
        return F.conv2d(t.reshape(b * c, 1, h, w), K, padding=1)

    pipe = build_loss_pipeline(
        {"enabled": True, "terms": [{"name": "gradient_l1", "weight": 1.0, "args": {"to_gray": False}}]}
    )
    res = pipe(xj, targets=yj)
    ref = float(torch.mean(torch.abs(grads(xt) - grads(yt))))
    assert abs(float(res["gradient_l1"]) - ref) < 1e-5


def test_mode_filtering(xy):
    xj, yj = xy
    pipe = build_loss_pipeline(
        {"enabled": True, "terms": [
            {"name": "mse", "weight": 1.0, "mode": "paired"},
            {"name": "l1", "weight": 1.0, "mode": "unpaired"},
        ]}
    )
    paired = pipe(xj, targets=yj, is_paired=True)
    assert "mse" in paired and "l1" not in paired
    unpaired = pipe(xj, targets=yj, is_paired=False)
    assert "l1" in unpaired and "mse" not in unpaired


def test_default_fallback_is_mse(xy):
    xj, yj = xy
    pipe = build_loss_pipeline(None)
    res = pipe(xj, targets=yj)
    assert set(res) == {"mse", "total"}


def test_unknown_loss_raises():
    with pytest.raises(ValueError):
        build_loss_pipeline({"enabled": True, "terms": [{"name": "zorp"}]})


def test_ssim_properties(xy):
    xj, yj = xy
    assert float(ssim(xj, xj)) == pytest.approx(1.0, abs=1e-5)
    assert float(ssim(xj, yj)) < 0.2  # random images are structurally unrelated
    noisy = jnp.clip(xj + 0.05 * jax.random.normal(jax.random.key(0), xj.shape), 0, 1)
    less_noisy = jnp.clip(xj + 0.01 * jax.random.normal(jax.random.key(0), xj.shape), 0, 1)
    assert float(ssim(less_noisy, xj)) > float(ssim(noisy, xj))


def test_psnr_known_value(xy):
    xj, _ = xy
    shifted = xj + 0.1  # uniform shift, unclipped: mse = 0.01 exactly
    assert float(psnr(xj, shifted, data_range=1.0)) == pytest.approx(20.0, abs=1e-3)


def test_metrics_pipeline_schema(xy):
    xj, yj = xy
    pipe = build_metrics_pipeline(
        {"enabled": True, "items": [{"name": "psnr"}, {"name": "ssim"}]}
    )
    out = pipe(xj, targets=yj)
    assert set(out) == {"psnr", "ssim"}
    disabled = build_metrics_pipeline({"enabled": False})
    assert disabled(xj, targets=yj) == {}
    with pytest.raises(ValueError):
        build_metrics_pipeline({"enabled": True, "items": [{"name": "zorp"}]})


def test_duplicate_metric_names_mode_filtered(xy):
    """Same metric name under both modes must not collide.

    The reference factory keys items by name (utils/metrics_factory.py:62)
    so the second entry silently clobbers the first; this pipeline keeps an
    ordered list and lets the mode filter pick the active one per call.
    """
    xj, yj = xy
    pipe = build_metrics_pipeline(
        {"enabled": True, "items": [
            {"name": "psnr", "mode": "paired"},
            {"name": "psnr", "mode": "unpaired"},
            {"name": "ssim"},
        ]}
    )
    assert len(pipe.metrics) == 3
    paired = pipe(xj, targets=yj, is_paired=True)
    assert set(paired) == {"psnr", "ssim"}
    # The unpaired call still evaluates its own psnr item (it needs targets
    # here only because the metric itself is pairwise).
    unpaired = pipe(xj, targets=yj, is_paired=False)
    assert set(unpaired) == {"psnr"}


def test_duplicate_loss_terms_accumulate(xy):
    """Two same-name loss terms are both applied (list semantics), and the
    late-binding closure bug the reference has (loss_factory.py:160-167
    pattern) must not make them share args."""
    xj, yj = xy
    pipe = build_loss_pipeline(
        {"enabled": True, "terms": [
            {"name": "charbonnier", "weight": 1.0, "args": {"eps": 1e-3}},
            {"name": "charbonnier", "weight": 1.0, "args": {"eps": 1.0}},
        ]}
    )
    res = pipe(xj, targets=yj)
    single = build_loss_pipeline(
        {"enabled": True, "terms": [{"name": "charbonnier", "weight": 1.0, "args": {"eps": 1e-3}}]}
    )(xj, targets=yj)
    big_eps = build_loss_pipeline(
        {"enabled": True, "terms": [{"name": "charbonnier", "weight": 1.0, "args": {"eps": 1.0}}]}
    )(xj, targets=yj)
    expected = float(single["charbonnier"]) + float(big_eps["charbonnier"])
    assert float(res["total"]) == pytest.approx(expected, rel=1e-5)


def test_vgg_and_lpips_terms_run(xy):
    """Without converted weights these use seeded random frozen features —
    they must still be finite, deterministic, and zero at identity."""
    xj, yj = xy
    pipe = build_loss_pipeline(
        {"enabled": True, "terms": [
            {"name": "vgg_perceptual", "weight": 1.0, "args": {"layers": 9}},
            {"name": "lpips", "weight": 1.0},
        ]}
    )
    res = pipe(xj, targets=yj)
    assert np.isfinite(float(res["total"]))
    res_same = pipe(xj, targets=xj)
    assert float(res_same["vgg_perceptual"]) == pytest.approx(0.0, abs=1e-8)
    assert float(res_same["lpips"]) == pytest.approx(0.0, abs=1e-6)
    res2 = pipe(xj, targets=yj)
    assert float(res2["total"]) == pytest.approx(float(res["total"]), rel=1e-6)


def test_masked_pipelines_equal_unpadded():
    """Pad-and-mask partial batches: pipelines on a padded batch with a
    validity mask give exactly the values of the unpadded batch (the
    reference computes partial-batch means directly)."""
    import numpy as np

    from multi_degradation_image_enhancement_tpu.ops.losses import build_loss_pipeline
    from multi_degradation_image_enhancement_tpu.ops.metrics import build_metrics_pipeline

    rng = np.random.RandomState(0)
    out_v = jnp.asarray(rng.rand(3, 16, 24, 3), jnp.float32)
    tgt_v = jnp.asarray(rng.rand(3, 16, 24, 3), jnp.float32)
    # pad to 5 by repeating the last sample (loader semantics)
    pad = lambda x: jnp.concatenate([x, jnp.tile(x[-1:], (2, 1, 1, 1))])
    mask = jnp.asarray([1.0, 1.0, 1.0, 0.0, 0.0])

    lp = build_loss_pipeline(
        {"terms": [
            {"name": "mse", "weight": 1.0},
            {"name": "charbonnier", "weight": 0.5},
            {"name": "ssim", "weight": 0.3},
            {"name": "gradient_l1", "weight": 0.2},
        ]}
    )
    ref = lp(out_v, targets=tgt_v)
    got = lp(pad(out_v), targets=pad(tgt_v), mask=mask)
    for k in ref:
        assert abs(float(ref[k]) - float(got[k])) < 1e-5, k

    mp = build_metrics_pipeline({"items": [{"name": "psnr"}, {"name": "ssim"}]})
    mref = mp(out_v, targets=tgt_v)
    mgot = mp(pad(out_v), targets=pad(tgt_v), mask=mask)
    for k in mref:
        assert abs(float(mref[k]) - float(mgot[k])) < 1e-4, k


def test_channel_mean_term(xy):
    """channel_mean (framework extension): L1 of per-image channel means.

    A uniform per-channel gain error of g on x vs x must score
    |g|*mean_c(x_c averages); invariance to zero-mean spatial noise."""
    xj, _ = xy
    pipe = build_loss_pipeline(
        {"enabled": True, "terms": [{"name": "channel_mean", "weight": 1.0}]}
    )
    gains = jnp.asarray([1.1, 0.8, 1.0])
    res = pipe(xj * gains, targets=xj)
    expected = float(
        jnp.mean(jnp.abs((gains - 1.0) * jnp.mean(xj, axis=(1, 2))))
    )
    assert abs(float(res["channel_mean"]) - expected) < 1e-6
    # spatially zero-mean perturbation leaves the term ~0
    rng = np.random.RandomState(0)
    noise = rng.rand(*np.asarray(xj).shape).astype(np.float32)
    noise -= noise.mean(axis=(1, 2), keepdims=True)
    res2 = pipe(xj + jnp.asarray(noise), targets=xj)
    assert float(res2["channel_mean"]) < 1e-6
    # mask: second sample invalid -> only first sample's error counts
    res3 = pipe(xj * gains, targets=xj, mask=jnp.asarray([1.0, 0.0]))
    expected0 = float(
        jnp.mean(jnp.abs((gains - 1.0) * jnp.mean(xj[:1], axis=(1, 2))))
    )
    assert abs(float(res3["channel_mean"]) - expected0) < 1e-6


def test_worst_case_weighting():
    """worst_case: top-k images dominate total; eval path unaffected."""
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.rand(4, 16, 16, 3).astype(np.float32))
    t = jnp.array(x)
    # image 2 is much worse than the others
    bad = x.at[2].add(0.5)
    cfg = {
        "enabled": True,
        "terms": [{"name": "l1", "weight": 1.0}],
        "worst_case": {"fraction": 0.25, "scale": 3.0},
    }
    pipe = build_loss_pipeline(cfg)
    stock = build_loss_pipeline({k: v for k, v in cfg.items() if k != "worst_case"})

    # eval (training=False): identical to stock
    ev, st = pipe(bad, targets=t), stock(bad, targets=t)
    assert abs(float(ev["total"]) - float(st["total"])) < 1e-7

    # training=True: weighted total exceeds the plain mean (worst image
    # up-weighted), logged component stays the plain mean
    tr = pipe(bad, targets=t, training=True)
    assert float(tr["total"]) > float(st["total"]) + 1e-4
    assert abs(float(tr["l1"]) - float(st["l1"])) < 1e-6
    # weighted mean equals (3*L2 + sum(L_others)) / 6 for k=1, scale=3
    per = jnp.mean(jnp.abs(bad - t), axis=(1, 2, 3))
    expect = float((3 * per[2] + per[0] + per[1] + per[3]) / 6.0)
    assert abs(float(tr["total"]) - expect) < 1e-6

    # scale=1 degenerates to the stock mean
    pipe1 = build_loss_pipeline({**cfg, "worst_case": {"fraction": 0.25, "scale": 1.0}})
    tr1 = pipe1(bad, targets=t, training=True)
    assert abs(float(tr1["total"]) - float(st["total"])) < 1e-6

    # masked (padded) images are never selected and carry no weight
    mask = jnp.asarray([1.0, 1.0, 0.0, 1.0])
    trm = pipe(bad, targets=t, mask=mask, training=True)
    worst_valid = jnp.argmax(jnp.where(mask > 0, per, -jnp.inf))
    w = jnp.where(jnp.arange(4) == worst_valid, 3.0, 1.0) * mask
    expect_m = float(jnp.sum(w * per) / jnp.sum(w))
    assert abs(float(trm["total"]) - expect_m) < 1e-6

    # jit + grad flow: gradient exists and is finite
    def loss(o):
        return pipe(o, targets=t, training=True)["total"]

    g = jax.jit(jax.grad(loss))(bad)
    assert np.all(np.isfinite(np.asarray(g)))
    # the up-weighted image's gradient is ~3x an equal-loss unweighted one
    g0 = np.abs(np.asarray(g[2])).mean()
    assert g0 > 0
