"""Fused hardware-PRNG noise-degrade kernel (ops/pallas/noise.py).

CPU tests exercise the full kernel math on injected bits against a NumPy
oracle (the interpret path cannot lower ``pltpu.prng_seed`` in this
toolchain); a TPU-gated test runs the real kernel and checks moments,
determinism, and cross-image stream independence.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multi_degradation_image_enhancement_tpu.ops.pallas.noise import (
    _bits_to_noise01,
    _bits_to_uniform,
    noise_degrade_01,
    seed_from_key,
    supported,
)


def _np_boxmuller(bits1, bits2):
    u1 = 1.0 - ((bits1 >> 9) / np.float32(2**23))
    u2 = (bits2 >> 9) / np.float32(2**23)
    r = np.sqrt(-2.0 * np.log(u1.astype(np.float64)))
    th = 2.0 * np.pi * u2.astype(np.float64)
    return np.concatenate([r * np.cos(th), r * np.sin(th)], axis=0)


def test_bits_to_uniform_range_and_values():
    rng = np.random.default_rng(0)
    bits = rng.integers(0, 2**32, size=(8, 256), dtype=np.uint32)
    u = np.asarray(_bits_to_uniform(jnp.asarray(bits)))
    assert u.min() >= 0.0 and u.max() < 1.0
    np.testing.assert_allclose(u, (bits >> 9) / np.float32(2**23), rtol=0, atol=0)


def test_kernel_math_matches_numpy_oracle():
    rng = np.random.default_rng(1)
    h, l = 16, 512
    bits1 = rng.integers(0, 2**32, size=(h // 2, l), dtype=np.uint32)
    bits2 = rng.integers(0, 2**32, size=(h // 2, l), dtype=np.uint32)
    x = rng.uniform(0, 255, size=(h, l)).astype(np.float32)
    std = np.float32(37.0)
    got = np.asarray(
        _bits_to_noise01(jnp.asarray(bits1), jnp.asarray(bits2), jnp.asarray(x), std, 1.0 / 255.0)
    )
    n = _np_boxmuller(bits1, bits2)
    want = np.floor(np.clip(x + std * n.astype(np.float32), 0.0, 255.0)) / 255.0
    # f32 transcendentals vs f64 oracle: the noise value can land within one
    # ulp of an integer boundary and floor to the adjacent u8 level.
    mismatch = np.abs(got - want) > 1e-6
    assert mismatch.mean() < 1e-3
    if mismatch.any():
        assert np.abs(got - want)[mismatch].max() <= (1.0 / 255.0) + 1e-6
    assert got.min() >= 0.0 and got.max() <= 1.0


def test_kernel_math_normal_moments():
    rng = np.random.default_rng(2)
    h, l = 64, 2048
    bits1 = rng.integers(0, 2**32, size=(h // 2, l), dtype=np.uint32)
    bits2 = rng.integers(0, 2**32, size=(h // 2, l), dtype=np.uint32)
    # zero clean image + huge offset so clip/floor never bind: recover σ·n
    x = np.full((h, l), 128.0, np.float32)
    std = np.float32(10.0)
    out = np.asarray(
        _bits_to_noise01(jnp.asarray(bits1), jnp.asarray(bits2), jnp.asarray(x), std, 1.0)
    )
    n = (out - 128.0) / std  # floor-quantized σ·n
    # floor() adds a −U[0,1)/σ bias ≈ −0.05 — bound loosely
    assert abs(n.mean()) < 0.07
    assert abs(n.std() - 1.0) < 0.02
    # Box–Muller halves must not correlate pixel-wise
    a, b = n[: h // 2].ravel(), n[h // 2 :].ravel()
    assert abs(np.corrcoef(a, b)[0, 1]) < 0.01


def test_supported_shapes():
    assert supported((4, 256, 384, 3))
    assert supported((4, 256, 256, 3))
    assert not supported((4, 256, 100, 3))
    assert not supported((4, 255, 256, 3))


def test_seed_from_key_deterministic():
    k = jax.random.key(42)
    s1, s2 = seed_from_key(k), seed_from_key(k)
    assert int(s1) == int(s2)
    assert int(seed_from_key(jax.random.key(43))) != int(s1)


@pytest.mark.skipif(jax.default_backend() == "cpu", reason="hardware PRNG needs a TPU")
def test_kernel_on_tpu_moments_and_determinism():
    b, h, w = 4, 64, 256  # w*3 = 768 ≡ 0 (mod 256)
    key = jax.random.key(7)
    clean = jax.random.uniform(key, (b, h, w, 3), minval=60.0, maxval=200.0)
    std = jnp.array([10.0, 20.0, 30.0, 50.0])
    seed = jnp.int32(1234)
    out1 = np.asarray(noise_degrade_01(clean, std, seed))
    out2 = np.asarray(noise_degrade_01(clean, std, seed))
    np.testing.assert_array_equal(out1, out2)  # deterministic per seed
    out3 = np.asarray(noise_degrade_01(clean, std, jnp.int32(99)))
    assert np.abs(out1 - out3).max() > 0  # seed changes the stream
    assert out1.min() >= 0.0 and out1.max() <= 1.0
    noise = out1 * 255.0 - np.asarray(jnp.floor(jnp.clip(clean, 0, 255)))
    for i in range(b):
        s = noise[i].std()
        assert abs(s - float(std[i])) / float(std[i]) < 0.05, (i, s)
    # image streams must differ (per-grid-step seeding)
    assert np.abs(noise[0] - noise[1]).max() > 1.0
