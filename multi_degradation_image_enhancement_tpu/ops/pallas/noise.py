"""Pallas TPU kernel: fused Gaussian-noise degradation (hardware PRNG).

The serving/bench pipeline's degrade stage draws B·H·W·3 normals per step;
with JAX's default threefry generator that costs ~2.8 ms at B=128·256²
(benchmarks/exp_rng.py) — pure PRNG compute, since the stage's bandwidth
floor is ~0.5 ms.  The ``rbg`` generator measured *slower* through XLA
(PERF.md round 2b), but the per-core hardware PRNG exposed to Pallas
(``pltpu.prng_random_bits``) is nearly free: this kernel generates the
bits in VMEM and fuses the whole degrade stage —

    out = floor(clip(x + σ·n, 0, 255)) · scale

(the reference's ``np.clip(img + noise, 0, 255).astype(np.uint8)`` u8
round-trip, ``generate_paired_degradation_dataset.py:107-122``, then the
network-domain ``/255``) — into one bandwidth-bound VMEM pass.

Normals come from Box–Muller on the raw bits, emitting BOTH outputs
(r·cosθ, r·sinθ) so each uniform pair yields two normals: exact Gaussian
marginals (tail truncated at ~5.7σ where u→2⁻²³, probability ~1e-8), half
the transcendental count.  Noise is i.i.d. per pixel, so assigning the
cos/sin halves to the top/bottom half-rows of the image block is
distribution-identical to any other layout (and keeps the lane dimension
untouched, so W·3 only needs 128-lane alignment).

Streams are deterministic from ``(seed, image index)``: the per-core PRNG
is re-seeded per grid step with the image index mixed in, so results are
reproducible for a fixed seed and independent of batch slicing.  The
stream differs from the threefry path (``ops.degradations
.add_gaussian_noise``) — same distribution, different draws — so this
kernel is an opt-in serving/bench fast path; training keeps threefry keys.

Interpreter-mode caveat: ``pltpu.prng_seed`` has no interpret lowering in
this toolchain, so CPU tests exercise :func:`_bits_to_noise01` (the entire
kernel math on injected bits) against NumPy, and a TPU-gated test checks
the real kernel's moments + determinism (tests/test_noise_kernel.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TWO_PI = 6.283185307179586


def _bits_to_uniform(bits: jax.Array) -> jax.Array:
    """uint32 bits → f32 uniform in [0, 1): set exponent to 2^0, keep the
    top 23 bits as mantissa, subtract 1."""
    mant = (bits >> jnp.uint32(9)) | jnp.uint32(0x3F800000)
    return jax.lax.bitcast_convert_type(mant, jnp.float32) - 1.0


def _bits_to_noise01(
    bits1: jax.Array, bits2: jax.Array, x: jax.Array, std: jax.Array, scale: float
) -> jax.Array:
    """The full kernel math on injected uniform bits (CPU-testable).

    bits1/bits2: uint32 [H/2, L] (one pair per TWO output elements);
    x: f32 [H, L] clean pixels in 0..255; std: scalar σ.
    Returns floor(clip(x + σ·n, 0, 255)) · scale.
    """
    u1 = 1.0 - _bits_to_uniform(bits1)  # (0, 1] — safe for log
    u2 = _bits_to_uniform(bits2)  # [0, 1)
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    theta = _TWO_PI * u2
    n = jnp.concatenate([r * jnp.cos(theta), r * jnp.sin(theta)], axis=0)
    noised = x + std * n
    return jnp.floor(jnp.clip(noised, 0.0, 255.0)) * scale


def _noise_kernel(seed_ref, std_ref, x_ref, o_ref, *, scale: float, out_dtype):
    i = pl.program_id(0)
    pltpu.prng_seed(seed_ref[0], i)
    h, l = x_ref.shape[1], x_ref.shape[2]
    bits1 = pltpu.bitcast(pltpu.prng_random_bits((h // 2, l)), jnp.uint32)
    bits2 = pltpu.bitcast(pltpu.prng_random_bits((h // 2, l)), jnp.uint32)
    out = _bits_to_noise01(bits1, bits2, x_ref[0], std_ref[i], scale)
    o_ref[0] = out.astype(out_dtype)


def seed_from_key(key: jax.Array) -> jax.Array:
    """Fold a JAX PRNG key into one int32 hardware-PRNG seed."""
    data = jax.random.key_data(key).astype(jnp.uint32).ravel()
    mixed = data[0] ^ (data[-1] * jnp.uint32(0x9E3779B9))
    return mixed.astype(jnp.int32)


def supported(images_shape) -> bool:
    b, h, w, c = images_shape
    line = w * c
    return line % 128 == 0 and h % 16 == 0  # lane-aligned rows, H/2 ≡ 0 (mod 8)


@functools.partial(jax.jit, static_argnames=("scale", "out_dtype"))
def noise_degrade_01(
    images: jax.Array,
    std: jax.Array,
    seed: jax.Array,
    *,
    scale: float = 1.0 / 255.0,
    out_dtype=jnp.float32,
) -> jax.Array:
    """Fused noise degrade: ``floor(clip(images + σ·n, 0, 255)) · scale``.

    Args:
      images: clean batch [B,H,W,3] f32 in 0..255.
      std: per-sample σ [B] f32 (reference range 10..50).
      seed: int32 scalar (see :func:`seed_from_key`).
      scale: static output scale (default 1/255 → network domain).
      out_dtype: output dtype (f32; bf16 matches a post-hoc cast).

    One image per grid step; requires W·3 ≡ 0 (mod 128) and H ≡ 0 (mod 16)
    — every reference resolution (256×384, 256×256) qualifies.  Callers
    should check :func:`supported` and fall back to the threefry path.
    """
    b, h, w, c = images.shape
    line = w * c
    if not supported(images.shape):
        raise ValueError(f"unsupported shape {images.shape}; check supported()")
    x = images.reshape(b, h, line)
    out = pl.pallas_call(
        functools.partial(_noise_kernel, scale=scale, out_dtype=out_dtype),
        grid=(b,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # seed (1,)
            pl.BlockSpec(memory_space=pltpu.SMEM),  # std (B,)
            pl.BlockSpec((1, h, line), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, h, line), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, line), out_dtype),
    )(seed.reshape(1), std.reshape(b).astype(jnp.float32), x)
    return out.reshape(b, h, w, c)


def degrade_noise_batch_fast(images: jax.Array, key: jax.Array, *, out_dtype=jnp.float32):
    """Serving-path equivalent of ``degrade_batch(images, "noise", key)``:
    σ ~ U[10,50] per sample (threefry, matching ``sample_params``), normals
    from the hardware PRNG.  Returns ``(degraded01, clean01)``.
    """
    k1, k2 = jax.random.split(key)
    std = jax.random.uniform(k1, (images.shape[0],), minval=10.0, maxval=50.0)
    degraded = noise_degrade_01(images, std, seed_from_key(k2), out_dtype=out_dtype)
    return degraded, images / 255.0
