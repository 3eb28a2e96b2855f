"""CDAN/CBAM structural tests (reference topology: models/cdan.py, models/cbam.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multi_degradation_image_enhancement_tpu.models.cbam import CBAM
from multi_degradation_image_enhancement_tpu.models.cdan import CDAN

REFERENCE_PARAM_COUNT = 3_585_663  # measured from the PyTorch reference (BASELINE.md)


def test_param_count_matches_reference_exactly():
    model = CDAN()
    # eval_shape → no compilation, fast on the 1-core host
    variables = jax.eval_shape(
        lambda: model.init({"params": jax.random.key(0)}, jnp.zeros((1, 32, 48, 3)), train=False)
    )
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(variables["params"]))
    assert n == REFERENCE_PARAM_COUNT


def test_cdan_has_batch_stats_and_expected_top_level_modules():
    model = CDAN()
    variables = jax.eval_shape(
        lambda: model.init({"params": jax.random.key(0)}, jnp.zeros((1, 32, 48, 3)), train=False)
    )
    assert set(variables) == {"params", "batch_stats"}
    assert set(variables["params"]) == {"encoder", "bottleneck", "decoder"}
    assert set(variables["params"]["encoder"]) == {
        "conv1", "conv2", "conv3", "conv4", "dense1", "dense2", "dense3",
    }


def test_cbam_forward_shapes_and_gating():
    model = CBAM(32)
    x = jnp.asarray(np.random.RandomState(0).rand(2, 8, 8, 32), jnp.float32)
    variables = model.init({"params": jax.random.key(0)}, x, train=False)
    y = model.apply(variables, x, train=False)
    assert y.shape == x.shape
    # sigmoid gates only attenuate non-negative inputs
    assert float(jnp.max(jnp.abs(y))) <= float(jnp.max(jnp.abs(x))) + 1e-6


def test_cbam_pool_variants():
    x = jnp.asarray(np.random.RandomState(0).rand(1, 8, 8, 32), jnp.float32)
    for pools in [("avg",), ("max",), ("lp",), ("lse",), ("avg", "max")]:
        m = CBAM(32, pool_types=pools, no_spatial=True)
        v = m.init({"params": jax.random.key(0)}, x, train=False)
        y = m.apply(v, x, train=False)
        assert y.shape == x.shape
        assert np.isfinite(np.asarray(y)).all()


@pytest.mark.slow
def test_cdan_forward_range_and_shape():
    """Full forward (compiles the whole network — minutes on 1 CPU core)."""
    model = CDAN()
    x = jnp.asarray(np.random.RandomState(0).rand(1, 16, 24, 3), jnp.float32)
    variables = model.init({"params": jax.random.key(0)}, x, train=False)
    y = model.apply(variables, x, train=False)
    assert y.shape == x.shape
    assert float(y.min()) >= 0.0 and float(y.max()) <= 1.0


def test_growth_rate_variant():
    """growth_rate widens the DenseBlocks (architectural opt-in, PERF.md
    roofline); default 16 stays exact reference parity."""
    import jax
    import jax.numpy as jnp

    from multi_degradation_image_enhancement_tpu.models.cdan import CDAN

    x = jnp.zeros((1, 16, 24, 3), jnp.float32)
    wide = CDAN(growth_rate=32)
    v = wide.init({"params": jax.random.key(0)}, x, train=False)
    n_wide = sum(p.size for p in jax.tree.leaves(v["params"]))
    assert n_wide > 3_585_663  # strictly more than the growth-16 reference
    out = wide.apply(v, x, train=False)
    assert out.shape == x.shape
