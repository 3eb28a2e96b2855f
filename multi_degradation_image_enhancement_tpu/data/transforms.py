"""Batched on-device paired transforms replacing albumentations/torchvision.

Capability parity with the reference transforms factory
(``utils/transforms_factory.py:19-127`` in /root/reference): the same config
schema (``backend`` + ``ops`` whitelist) builds a transform; the ops used by
the 11 task configs (Resize, HorizontalFlip, VerticalFlip, RandomRotate90,
RandomBrightnessContrast, Normalize, ToTensorV2) are fully supported, plus
the rest of the reference's albumentations whitelist (GaussNoise,
MotionBlur, RandomGamma, Sharpen, HueSaturationValue, CLAHE — the last two
golden-tested against cv2 color math) and the torchvision-backend basics.

Design differences (deliberate, TPU-first):
  * transforms run *batched on device* inside jit — per-sample random
    parameters are drawn from a JAX key, so a batch of differently-augmented
    images compiles to one fused program (the reference runs per-image CPU
    albumentations in DataLoader workers);
  * paired consistency is exact for **both** backends by key sharing — the
    reference's torchvision path applies random augs to input and target
    independently (acknowledged bug at ``transforms_factory.py:118``); we fix
    it, as SURVEY.md §7 prescribes;
  * layout is NHWC throughout — ``ToTensorV2`` / ``ToTensor`` keep their
    value semantics (identity / scale-to-[0,1]) without the NCHW permute.

Value convention: inputs arrive as float32 in 0..255; ``Normalize`` /
``ToTensor`` move them to the network domain.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from multi_degradation_image_enhancement_tpu.ops.degradations import motion_blur
from multi_degradation_image_enhancement_tpu.ops.image import resize_bilinear_cv

# A transform op: (images[B,H,W,C], key) -> images
TransformOp = Callable[[jax.Array, jax.Array], jax.Array]


def _per_sample_bernoulli(key: jax.Array, b: int, p: float) -> jax.Array:
    return jax.random.uniform(key, (b,)) < p


def _select(mask: jax.Array, a: jax.Array, b: jax.Array) -> jax.Array:
    return jnp.where(mask[:, None, None, None], a, b)


def _op_hflip(p: float) -> TransformOp:
    def op(x, key):
        m = _per_sample_bernoulli(key, x.shape[0], p)
        return _select(m, x[:, :, ::-1, :], x)

    return op


def _op_vflip(p: float) -> TransformOp:
    def op(x, key):
        m = _per_sample_bernoulli(key, x.shape[0], p)
        return _select(m, x[:, ::-1, :, :], x)

    return op


def _op_rot90(p: float) -> TransformOp:
    """albumentations RandomRotate90: with prob p rotate by k·90°, k ~ U{0..3}.

    Non-square batches stay static-shaped: odd-k rotations are computed on
    the fixed H×W canvas by rotating and resizing back.  For inputs already
    at their final size (the standard pipeline) this matches the reference's
    rotate-then-Resize exactly.
    """

    def op(x, key):
        b, h, w, c = x.shape
        k_apply, k_factor = jax.random.split(key)
        applied = _per_sample_bernoulli(k_apply, b, p)
        factor = jax.random.randint(k_factor, (b,), 0, 4) * applied.astype(jnp.int32)

        # np.rot90 convention (albumentations uses np.rot90(img, factor)).
        r1 = resize_bilinear_cv(jnp.rot90(x, 1, axes=(1, 2)), h, w)
        r2 = jnp.rot90(x, 2, axes=(1, 2))
        r3 = resize_bilinear_cv(jnp.rot90(x, 3, axes=(1, 2)), h, w)
        stacked = jnp.stack([x, r1, r2, r3], axis=0)  # [4,B,H,W,C]
        return jnp.take_along_axis(
            stacked, factor[None, :, None, None, None], axis=0
        )[0]

    return op


def _op_resize(height: int, width: int) -> TransformOp:
    def op(x, key):
        if x.shape[1] == height and x.shape[2] == width:
            return x
        return resize_bilinear_cv(x, height, width)

    return op


def _op_normalize(mean, std, max_pixel_value: float = 255.0) -> TransformOp:
    mean_a = jnp.asarray(mean, jnp.float32) * max_pixel_value
    std_a = jnp.asarray(std, jnp.float32) * max_pixel_value

    def op(x, key):
        return (x - mean_a) / std_a

    return op


def _op_to_tensor_scale() -> TransformOp:
    def op(x, key):
        return x / 255.0

    return op


def _op_identity() -> TransformOp:
    return lambda x, key: x


def _op_brightness_contrast(
    brightness_limit: float = 0.2, contrast_limit: float = 0.2, p: float = 0.5
) -> TransformOp:
    """albumentations RandomBrightnessContrast (brightness_by_max=True):
    out = img·α + β·max_value, α = 1+U(−c,c), β = U(−b,b)."""

    def op(x, key):
        b = x.shape[0]
        ka, kb, kc = jax.random.split(key, 3)
        applied = _per_sample_bernoulli(ka, b, p).astype(jnp.float32)
        alpha = 1.0 + jax.random.uniform(kb, (b,), minval=-contrast_limit, maxval=contrast_limit)
        beta = jax.random.uniform(kc, (b,), minval=-brightness_limit, maxval=brightness_limit)
        alpha = 1.0 + (alpha - 1.0) * applied
        beta = beta * applied
        out = x * alpha[:, None, None, None] + beta[:, None, None, None] * 255.0
        return jnp.clip(out, 0.0, 255.0)

    return op


def _op_gauss_noise(var_limit=(10.0, 50.0), p: float = 0.5) -> TransformOp:
    def op(x, key):
        b = x.shape[0]
        ka, kv, kn = jax.random.split(key, 3)
        applied = _per_sample_bernoulli(ka, b, p).astype(jnp.float32)
        var = jax.random.uniform(kv, (b,), minval=var_limit[0], maxval=var_limit[1])
        sigma = jnp.sqrt(var) * applied
        noise = jax.random.normal(kn, x.shape) * sigma[:, None, None, None]
        return jnp.clip(x + noise, 0.0, 255.0)

    return op


def _op_motion_blur(blur_limit: int = 7, p: float = 0.5) -> TransformOp:
    def op(x, key):
        b = x.shape[0]
        ka, kk = jax.random.split(key)
        applied = _per_sample_bernoulli(ka, b, p)
        k = jax.random.randint(kk, (b,), 3, blur_limit + 1)
        k = jnp.where(applied, k, 1)  # k=1 ≈ identity
        return motion_blur(x, k)

    return op


def _op_random_gamma(gamma_limit=(80.0, 120.0), p: float = 0.5) -> TransformOp:
    def op(x, key):
        b = x.shape[0]
        ka, kg = jax.random.split(key)
        applied = _per_sample_bernoulli(ka, b, p).astype(jnp.float32)
        gamma = jax.random.uniform(kg, (b,), minval=gamma_limit[0] / 100.0,
                                   maxval=gamma_limit[1] / 100.0)
        gamma = 1.0 + (gamma - 1.0) * applied
        x01 = jnp.clip(x / 255.0, 1e-8, 1.0)
        return jnp.power(x01, gamma[:, None, None, None]) * 255.0

    return op


def _op_hsv(
    hue_limit: float = 20, sat_limit: float = 30, val_limit: float = 20, p: float = 0.5
) -> TransformOp:
    """albumentations HueSaturationValue: per-sample uniform shifts in cv2 HSV."""
    from multi_degradation_image_enhancement_tpu.ops.color import (
        hsv_to_rgb_cv,
        rgb_to_hsv_cv,
    )

    def op(x, key):
        b = x.shape[0]
        ka, kh, ks, kv = jax.random.split(key, 4)
        applied = _per_sample_bernoulli(ka, b, p).astype(jnp.float32)[:, None, None]
        dh = jax.random.uniform(kh, (b,), minval=-hue_limit, maxval=hue_limit)
        ds = jax.random.uniform(ks, (b,), minval=-sat_limit, maxval=sat_limit)
        dv = jax.random.uniform(kv, (b,), minval=-val_limit, maxval=val_limit)
        hsv = rgb_to_hsv_cv(x)
        h = jnp.mod(hsv[..., 0] + applied * dh[:, None, None], 180.0)
        s = jnp.clip(hsv[..., 1] + applied * ds[:, None, None], 0.0, 255.0)
        v = jnp.clip(hsv[..., 2] + applied * dv[:, None, None], 0.0, 255.0)
        out = hsv_to_rgb_cv(jnp.stack([h, s, v], axis=-1))
        return jnp.clip(out, 0.0, 255.0)

    return op


def _op_clahe(clip_limit: float = 4.0, grid=(8, 8), p: float = 0.5) -> TransformOp:
    """albumentations CLAHE (LAB-L channel), batched on device."""
    from multi_degradation_image_enhancement_tpu.ops.clahe import clahe_rgb

    def op(x, key):
        b = x.shape[0]
        applied = _per_sample_bernoulli(key, b, p)
        enhanced = clahe_rgb(x, grid=grid[0], clip_limit=clip_limit)
        return _select(applied, enhanced, x)

    return op


def _albu_op(name: str, args: Dict[str, Any]) -> TransformOp:
    if name == "Resize":
        return _op_resize(args["height"], args["width"])
    if name == "HorizontalFlip":
        return _op_hflip(args.get("p", 0.5))
    if name == "VerticalFlip":
        return _op_vflip(args.get("p", 0.5))
    if name == "RandomRotate90":
        return _op_rot90(args.get("p", 0.5))
    if name == "RandomBrightnessContrast":
        return _op_brightness_contrast(
            args.get("brightness_limit", 0.2), args.get("contrast_limit", 0.2),
            args.get("p", 0.5),
        )
    if name == "GaussNoise":
        return _op_gauss_noise(tuple(args.get("var_limit", (10.0, 50.0))), args.get("p", 0.5))
    if name == "MotionBlur":
        return _op_motion_blur(args.get("blur_limit", 7), args.get("p", 0.5))
    if name == "RandomGamma":
        return _op_random_gamma(tuple(args.get("gamma_limit", (80, 120))), args.get("p", 0.5))
    if name == "Sharpen":
        # albumentations Sharpen blends an unsharp-masked image; approximate
        # with the framework sharpen op at its alpha midpoint.
        from multi_degradation_image_enhancement_tpu.ops.post_processing import sharpen as _sh

        alpha = tuple(args.get("alpha", (0.2, 0.5)))
        p = args.get("p", 0.5)

        def op(x, key):
            b = x.shape[0]
            ka, _ = jax.random.split(key)
            applied = _per_sample_bernoulli(ka, b, p)
            sharped = _sh(x / 255.0, strength=float(sum(alpha) / 2)) * 255.0
            return _select(applied, sharped, x)

        return op
    if name == "HueSaturationValue":
        return _op_hsv(
            args.get("hue_shift_limit", 20), args.get("sat_shift_limit", 30),
            args.get("val_shift_limit", 20), args.get("p", 0.5),
        )
    if name == "CLAHE":
        return _op_clahe(args.get("clip_limit", 4.0),
                         tuple(args.get("tile_grid_size", (8, 8))), args.get("p", 0.5))
    if name == "Normalize":
        return _op_normalize(args["mean"], args["std"], args.get("max_pixel_value", 255.0))
    if name == "ToTensorV2":
        return _op_identity()  # NHWC stays NHWC; values unchanged
    raise ValueError(f"[albumentations] Transform not supported: {name}")


def _tv_op(name: str, args: Dict[str, Any]) -> TransformOp:
    if name == "Resize":
        if "size" in args:
            h, w = tuple(args["size"])
        else:
            h, w = args["height"], args["width"]
        return _op_resize(h, w)
    if name == "ToTensor":
        return _op_to_tensor_scale()
    if name == "Normalize":
        # torchvision Normalize operates post-ToTensor in [0,1]
        mean_a = jnp.asarray(args["mean"], jnp.float32)
        std_a = jnp.asarray(args["std"], jnp.float32)
        return lambda x, key: (x - mean_a) / std_a
    if name == "RandomHorizontalFlip":
        return _op_hflip(args.get("p", 0.5))
    if name == "RandomVerticalFlip":
        return _op_vflip(args.get("p", 0.5))
    if name == "RandomRotation":
        degrees = args.get("degrees", 0)
        return _op_rotation(degrees)
    if name == "ColorJitter":
        return _op_color_jitter(**args)
    raise ValueError(f"[torchvision] Transform not supported: {name}")


def _op_rotation(degrees: float) -> TransformOp:
    """torchvision RandomRotation: uniform angle in [−d, d], bilinear, zero fill."""

    def op(x, key):
        b, h, w, c = x.shape
        ang = jax.random.uniform(key, (b,), minval=-degrees, maxval=degrees)
        theta = -ang * jnp.pi / 180.0  # image-coords rotation
        cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
        yy, xx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                              jnp.arange(w, dtype=jnp.float32), indexing="ij")

        def rot_one(img, t):
            cos, sin = jnp.cos(t), jnp.sin(t)
            sy = cy + (yy - cy) * cos - (xx - cx) * sin
            sx = cx + (yy - cy) * sin + (xx - cx) * cos
            def sample(ch):
                return jax.scipy.ndimage.map_coordinates(ch, [sy, sx], order=1, cval=0.0)
            return jnp.stack([sample(img[..., k]) for k in range(img.shape[-1])], axis=-1)

        return jax.vmap(rot_one)(x, theta)

    return op


def _op_color_jitter(
    brightness: float = 0.0, contrast: float = 0.0,
    saturation: float = 0.0, hue: float = 0.0, **_ignored,
) -> TransformOp:
    """torchvision ColorJitter semantics on 0..255 inputs (fixed op order)."""

    def factors(key, b, amount):
        lo, hi = max(0.0, 1.0 - amount), 1.0 + amount
        return jax.random.uniform(key, (b,), minval=lo, maxval=hi)[:, None, None, None]

    def op(x, key):
        b = x.shape[0]
        kb, kc, ks, kh = jax.random.split(key, 4)
        out = x
        if brightness:
            out = jnp.clip(out * factors(kb, b, brightness), 0.0, 255.0)
        if contrast:
            gray_mean = jnp.mean(
                0.299 * out[..., 0] + 0.587 * out[..., 1] + 0.114 * out[..., 2],
                axis=(1, 2), keepdims=True,
            )[..., None]
            out = jnp.clip(gray_mean + factors(kc, b, contrast) * (out - gray_mean), 0.0, 255.0)
        if saturation:
            gray = (0.299 * out[..., 0] + 0.587 * out[..., 1] + 0.114 * out[..., 2])[..., None]
            out = jnp.clip(gray + factors(ks, b, saturation) * (out - gray), 0.0, 255.0)
        if hue:
            shift = jax.random.uniform(kh, (b,), minval=-hue, maxval=hue)
            out = _hue_shift(out, shift)
        return out

    return op


def _hue_shift(x: jax.Array, shift: jax.Array) -> jax.Array:
    """Shift hue by ``shift`` (fraction of the color wheel) via YIQ rotation."""
    angle = shift * 2.0 * jnp.pi
    cos, sin = jnp.cos(angle)[:, None, None], jnp.sin(angle)[:, None, None]
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    i = 0.596 * r - 0.274 * g - 0.322 * b
    q = 0.211 * r - 0.523 * g + 0.312 * b
    i2 = i * cos - q * sin
    q2 = i * sin + q * cos
    r2 = y + 0.956 * i2 + 0.621 * q2
    g2 = y - 0.272 * i2 - 0.647 * q2
    b2 = y - 1.106 * i2 + 1.703 * q2
    return jnp.clip(jnp.stack([r2, g2, b2], axis=-1), 0.0, 255.0)


class DeviceTransform:
    """A compiled chain of batched transform ops with paired key-sharing."""

    def __init__(self, ops: List[TransformOp], target_hw: Optional[Tuple[int, int]]):
        self.ops = ops
        self.target_hw = target_hw  # size the loader should deliver batches at

    def __call__(self, images: jax.Array, key: jax.Array) -> jax.Array:
        for i, op in enumerate(self.ops):
            images = op(images, jax.random.fold_in(key, i))
        return images

    def apply_paired(
        self, inp: jax.Array, tgt: jax.Array, key: jax.Array
    ) -> Tuple[jax.Array, jax.Array]:
        """Identical random params on input and target (albumentations
        ``additional_targets`` semantics, ``transforms_factory.py:85``)."""
        return self(inp, key), self(tgt, key)


def build_transforms(
    transform_cfg: Optional[Dict[str, Any]], is_paired: bool
) -> Tuple[str, DeviceTransform]:
    """Build a transform chain; returns (backend, transform).

    Signature parity with reference ``utils/transforms_factory.py:89-108``;
    default (no config) is the torchvision ``ToTensor`` equivalent.
    """
    if not transform_cfg:
        return "torchvision", DeviceTransform([_op_to_tensor_scale()], None)

    backend = transform_cfg.get("backend", "torchvision")
    ops_cfg = transform_cfg.get("ops", []) or []

    target_hw: Optional[Tuple[int, int]] = None
    ops: List[TransformOp] = []
    for op in ops_cfg:
        name = op["name"]
        args = op.get("args", {}) or {}
        if name == "Resize":
            if "size" in args:
                target_hw = tuple(args["size"])
            else:
                target_hw = (args["height"], args["width"])
        if backend == "albumentations":
            ops.append(_albu_op(name, args))
        elif backend == "torchvision":
            ops.append(_tv_op(name, args))
        else:
            raise ValueError(f"Unknown transform backend: {backend}")
    return backend, DeviceTransform(ops, target_hw)
