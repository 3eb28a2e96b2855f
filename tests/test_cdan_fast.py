"""Fused CDAN serving forward vs the canonical Flax module."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multi_degradation_image_enhancement_tpu.models.cdan import CDAN
from multi_degradation_image_enhancement_tpu.models.cdan_fast import build_fast_apply


@pytest.fixture(scope="module")
def cdan_vars():
    x = jnp.zeros((1, 32, 48, 3), jnp.float32)
    m = CDAN(dtype=jnp.float32)
    v = m.init({"params": jax.random.key(0)}, x, train=False)
    # Perturb the running stats so every BN fold is exercised non-trivially.
    rng = np.random.RandomState(0)
    bs = jax.tree.map(
        lambda t: jnp.asarray(rng.uniform(0.5, 1.5, t.shape), t.dtype), v["batch_stats"]
    )
    return {"params": v["params"], "batch_stats": bs}


def test_fused_forward_matches_module(cdan_vars):
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.rand(2, 32, 48, 3), jnp.float32)
    ref = CDAN(dtype=jnp.float32).apply(cdan_vars, x, train=False)
    fast = build_fast_apply(cdan_vars, jnp.float32, interpret=True)
    got = fast(x)
    assert got.shape == ref.shape
    assert got.dtype == jnp.float32
    # DenseBlocks compute bf16 internally (matching the production bf16
    # path), so the comparison is bf16-class even at f32 module dtype;
    # outputs are post-sigmoid in [0,1].
    assert float(jnp.abs(ref - got).max()) < 2e-2
    assert float(jnp.abs(ref - got).mean()) < 2e-3


def test_engine_fused_flag_routes_eval(tmp_path):
    """fused_kernels=true routes engine eval through the fused forward."""
    from multi_degradation_image_enhancement_tpu.engine.model import Model

    class _Logger:
        def run_dir(self):
            return None

        def log_test(self, row):
            pass

        def set_summary(self, d):
            pass

    cfg = {
        "task": "t",
        "phase": "test",
        "test": {
            "fused_kernels": True,
            "device": "tpu",
            "dataloader": {"args": {"batch_size": 1}},
            "model_path": str(tmp_path),
            "model_name": "t.pt",
        },
        "train": {"n_epoch": 1, "lr": 1e-3, "precision": "fp32"},
        "save_outputs": {"enabled": False},
        "model": {},
    }
    engine = Model(
        network=CDAN(dtype=jnp.float32),
        config=cfg,
        dataloader=None,
        logger=_Logger(),
    )
    x = jnp.zeros((1, 16, 24, 3), jnp.float32)
    variables = engine.network.init({"params": jax.random.key(0)}, x, train=False)
    fwd = engine._fused_eval_forward(variables["params"], variables["batch_stats"])
    assert fwd is not None
    out = fwd(jnp.full((1, 16, 24, 3), 0.5, jnp.float32))
    assert out.shape == (1, 16, 24, 3)
    assert bool(jnp.all(jnp.isfinite(out)))

    # auto on CPU → module path (None); explicit false → None
    cfg_auto = dict(cfg, test={k: v for k, v in cfg["test"].items() if k != "fused_kernels"})
    engine_auto = Model(
        network=CDAN(dtype=jnp.float32), config=cfg_auto, dataloader=None, logger=_Logger()
    )
    if jax.default_backend() == "cpu":
        assert (
            engine_auto._fused_eval_forward(variables["params"], variables["batch_stats"])
            is None
        )


def test_cm_forward_matches_module(cdan_vars):
    """All-channel-major forward (conv/DB/CBAM/pool/upsample in [B,C,HW])
    equals the canonical module apply."""
    from multi_degradation_image_enhancement_tpu.models.cdan_fast import (
        build_fast_apply_cm,
        cm_forward_supported,
    )

    assert cm_forward_supported(16, 32)
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.rand(1, 16, 32, 3), jnp.float32)
    ref = CDAN(dtype=jnp.float32).apply(cdan_vars, x, train=False)
    got = build_fast_apply_cm(cdan_vars, jnp.float32, interpret=True)(x)
    assert got.shape == ref.shape
    assert float(jnp.abs(ref - got).max()) < 2e-2
    assert float(jnp.abs(ref - got).mean()) < 2e-3


def test_serving_apply_dispatches_by_shape():
    """build_serving_apply routes CM-supported shapes to the CM forward and
    everything else to the per-DenseBlock path (trace-time dispatch)."""
    from multi_degradation_image_enhancement_tpu.models import cdan_fast

    calls = []
    fake_cm = lambda x: calls.append("cm") or x
    fake_v1 = lambda x: calls.append("v1") or x

    class _V(dict):
        pass

    import unittest.mock as mock

    with mock.patch.object(cdan_fast, "build_fast_apply_cm", return_value=fake_cm), \
         mock.patch.object(cdan_fast, "build_fast_apply", return_value=fake_v1), \
         mock.patch.object(cdan_fast, "_SERVING_PREFER_CM", True):
        fn = cdan_fast.build_serving_apply({}, jnp.float32)
        fn(jnp.zeros((1, 32, 48, 3)))   # supported -> cm
        fn(jnp.zeros((1, 8, 8, 3)))     # w%16 != 0 -> v1
    assert calls == ["cm", "v1"]
    # default preference: v1 until the CM path measures faster (PERF.md)
    calls.clear()
    with mock.patch.object(cdan_fast, "build_fast_apply_cm", return_value=fake_cm), \
         mock.patch.object(cdan_fast, "build_fast_apply", return_value=fake_v1):
        fn = cdan_fast.build_serving_apply({}, jnp.float32)
        fn(jnp.zeros((1, 32, 48, 3)))
    assert calls == ["v1"]
