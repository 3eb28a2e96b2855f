"""Driver entry points: shape/trace checks (full compiles are the driver's job)."""

import jax
import jax.numpy as jnp
import numpy as np

import __graft_entry__ as graft


def test_entry_traces_with_correct_shapes():
    fn, args = graft.entry()
    out = jax.eval_shape(fn, *args)
    assert out.shape == args[0].shape
    assert out.dtype == jnp.float32


def test_jpeg_quality_tables():
    from multi_degradation_image_enhancement_tpu.ops.jpeg import (
        CHROMA_QTABLE,
        LUMA_QTABLE,
        quality_to_qtables,
    )

    # q=50 → scale 100 → tables equal the IJG base tables
    lq, cq = quality_to_qtables(jnp.asarray(50.0))
    np.testing.assert_array_equal(np.asarray(lq), np.asarray(LUMA_QTABLE))
    np.testing.assert_array_equal(np.asarray(cq), np.asarray(CHROMA_QTABLE))
    # q=100 → all ones (lossless-ish); q=10 → much coarser than base
    lq, _ = quality_to_qtables(jnp.asarray(100.0))
    assert float(jnp.max(lq)) == 1.0
    lq10, _ = quality_to_qtables(jnp.asarray(10.0))
    assert float(jnp.min(lq10)) >= float(jnp.min(LUMA_QTABLE))
    assert float(jnp.max(lq10)) == 255.0  # clamped
    # per-sample batched qualities broadcast
    lqs, _ = quality_to_qtables(jnp.asarray([10.0, 50.0]))
    assert lqs.shape == (2, 8, 8)


def test_dct_roundtrip_identity():
    from multi_degradation_image_enhancement_tpu.ops.jpeg import dct2_blocks, idct2_blocks

    rng = np.random.RandomState(0)
    blocks = jnp.asarray(rng.randn(4, 8, 8), jnp.float32)
    rec = idct2_blocks(dct2_blocks(blocks))
    assert float(jnp.abs(rec - blocks).max()) < 1e-4
