"""BN recalibration ("precise BN"): stats_refresh mode + engine integration.

The training EMA tracks batch statistics of a moving network, so the stats
saved with a best checkpoint lag its final weights (measured +4.6 dB test
PSNR on the low_light parity task — PARITY.md).  ``stats_refresh=True``
runs BatchNorm on batch statistics with dropout OFF so frozen-weight
sweeps can re-center the running averages.
"""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multi_degradation_image_enhancement_tpu.models.cdan import ConvBlock
from tests.tiny_net import TinyNet


def test_stats_refresh_updates_stats_without_dropout():
    """Refresh mode: deterministic outputs (no dropout), moving stats."""
    net = TinyNet(stats_refresh=True)
    x = jnp.asarray(np.random.RandomState(0).rand(4, 8, 8, 3), jnp.float32)
    v = TinyNet().init({"params": jax.random.key(0), "dropout": jax.random.key(1)}, x)

    y1, upd1 = net.apply(v, x, train=False, mutable=["batch_stats"])
    y2, _ = net.apply(v, x, train=False, mutable=["batch_stats"])
    # no dropout rng needed, and two applies agree exactly
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
    # stats moved toward the batch statistics
    before = jax.tree_util.tree_leaves(v["batch_stats"])
    after = jax.tree_util.tree_leaves(upd1["batch_stats"])
    assert any(not np.allclose(b, a) for b, a in zip(before, after))


def test_stats_refresh_converges_to_population_stats():
    """Repeated refresh sweeps drive BN means to the activation means."""
    block = ConvBlock(8, stats_refresh=True)
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.rand(16, 8, 8, 3) * 3.0 + 1.0, jnp.float32)
    v = ConvBlock(8).init({"params": jax.random.key(0)}, x)

    bs = v["batch_stats"]
    for _ in range(150):  # momentum 0.9: residual of init stats ≈ 0.9^150 ≈ 1e-7
        _, upd = block.apply(
            {"params": v["params"], "batch_stats": bs}, x, train=False,
            mutable=["batch_stats"],
        )
        bs = upd["batch_stats"]

    conv_out = jax.lax.conv_general_dilated(
        x, v["params"]["Conv_0"]["kernel"], (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + v["params"]["Conv_0"]["bias"]
    expected_mean = np.asarray(jnp.mean(conv_out, axis=(0, 1, 2)))
    got_mean = np.asarray(jax.tree_util.tree_leaves(bs)[0])
    np.testing.assert_allclose(got_mean, expected_mean, rtol=1e-3, atol=1e-4)


def test_engine_bn_recalibration_rewrites_checkpoint(tmp_path):
    """train.bn_recalibration refreshes the served checkpoint's stats."""
    from multi_degradation_image_enhancement_tpu.engine import checkpoint as ckpt
    from multi_degradation_image_enhancement_tpu.utils.config import load_config
    from tests.test_engine import _tiny_config

    import run as run_cli

    cfg_dict = _tiny_config(tmp_path, n_epoch=1)
    cfg_dict["train"]["bn_recalibration"] = {"passes": 2}
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(cfg_dict))
    run_cli.main(load_config(str(cfg_path), phase="train"))

    weights = tmp_path / "weights" / "tiny.pt"
    assert weights.is_file()
    # summary records the recalibration
    run_dirs = sorted((tmp_path / "runs" / "tiny").iterdir())
    summary = json.loads((run_dirs[-1] / "summary.json").read_text())
    assert summary.get("bn_recalibration_passes") == 2

    # the refreshed stats must differ from a plain-trained run's stats
    cfg_dict2 = _tiny_config(tmp_path, n_epoch=1)
    cfg_dict2["train"]["model_path"] = str(tmp_path / "weights2") + "/"
    cfg_dict2["logging"]["root_dir"] = str(tmp_path / "runs2")
    cfg_path2 = tmp_path / "cfg2.json"
    cfg_path2.write_text(json.dumps(cfg_dict2))
    run_cli.main(load_config(str(cfg_path2), phase="train"))

    x = jnp.zeros((1, 16, 24, 3), jnp.float32)
    tmpl = TinyNet().init({"params": jax.random.key(0), "dropout": jax.random.key(1)}, x)
    w1 = ckpt.load_weights(str(weights), tmpl["params"], tmpl["batch_stats"])
    w2 = ckpt.load_weights(
        str(tmp_path / "weights2" / "tiny.pt"), tmpl["params"], tmpl["batch_stats"]
    )
    # identical training (same seed) → identical params...
    for a, b in zip(
        jax.tree_util.tree_leaves(w1["params"]), jax.tree_util.tree_leaves(w2["params"])
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
    # ...but recalibrated stats differ from the training-EMA stats
    s1 = jax.tree_util.tree_leaves(w1["batch_stats"])
    s2 = jax.tree_util.tree_leaves(w2["batch_stats"])
    assert any(not np.allclose(a, b) for a, b in zip(s1, s2))


def test_engine_bn_recalibration_keeps_prerecal_backup(tmp_path):
    """ADVICE r2: the refresh is task-dependent (blur regresses −0.83 dB), so
    the stock stats must stay recoverable next to the rewritten checkpoint."""
    from multi_degradation_image_enhancement_tpu.engine import checkpoint as ckpt
    from multi_degradation_image_enhancement_tpu.utils.config import load_config
    from tests.test_engine import _tiny_config

    import run as run_cli

    cfg_dict = _tiny_config(tmp_path, n_epoch=1)
    cfg_dict["train"]["bn_recalibration"] = True
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(cfg_dict))
    run_cli.main(load_config(str(cfg_path), phase="train"))

    weights = tmp_path / "weights" / "tiny.pt"
    backup = tmp_path / "weights" / "tiny.pt.prerecal"
    assert weights.is_file() and backup.is_file()

    x = jnp.zeros((1, 16, 24, 3), jnp.float32)
    tmpl = TinyNet().init({"params": jax.random.key(0), "dropout": jax.random.key(1)}, x)
    wr = ckpt.load_weights(str(weights), tmpl["params"], tmpl["batch_stats"])
    wb = ckpt.load_weights(str(backup), tmpl["params"], tmpl["batch_stats"])
    # params identical, stats rewritten relative to the backup
    for a, b in zip(
        jax.tree_util.tree_leaves(wr["params"]), jax.tree_util.tree_leaves(wb["params"])
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
    sr = jax.tree_util.tree_leaves(wr["batch_stats"])
    sb = jax.tree_util.tree_leaves(wb["batch_stats"])
    assert any(not np.allclose(a, b) for a, b in zip(sr, sb))


def test_recalibrate_bn_skips_cleanly_without_checkpoint(tmp_path, capsys):
    """ADVICE r2: an all-NaN run never saves a checkpoint; recalibration must
    skip with a diagnostic instead of raising FileNotFoundError."""
    from multi_degradation_image_enhancement_tpu.utils.config import load_config
    from run import build_session
    from tests.test_engine import _tiny_config

    cfg_dict = _tiny_config(tmp_path, n_epoch=1)
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(cfg_dict))
    _, engine = build_session(load_config(str(cfg_path), phase="train"))
    engine.recalibrate_bn(passes=1)  # no checkpoint saved yet
    out = capsys.readouterr().out
    assert "no checkpoint" in out
