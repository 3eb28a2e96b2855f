"""HSV / CLAHE transforms vs cv2 oracles."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from multi_degradation_image_enhancement_tpu.data.transforms import build_transforms
from multi_degradation_image_enhancement_tpu.ops.clahe import clahe_l_channel
from multi_degradation_image_enhancement_tpu.ops.color import hsv_to_rgb_cv, rgb_to_hsv_cv


@pytest.fixture(scope="module")
def img():
    return np.random.RandomState(0).randint(0, 256, (32, 48, 3)).astype(np.uint8)


def test_hsv_matches_cv2_float(img):
    ref = cv2.cvtColor(img.astype(np.float32) / 255.0, cv2.COLOR_RGB2HSV)
    ours = np.asarray(rgb_to_hsv_cv(jnp.asarray(img, jnp.float32)))
    assert np.abs(ref[..., 0] / 2 - ours[..., 0]).max() < 1e-2  # H (cv2 fp32 H∈[0,360))
    assert np.abs(ref[..., 1] * 255 - ours[..., 1]).max() < 1e-2  # S
    assert np.abs(ref[..., 2] * 255 - ours[..., 2]).max() < 1e-2  # V


def test_hsv_roundtrip(img):
    x = jnp.asarray(img, jnp.float32)
    back = hsv_to_rgb_cv(rgb_to_hsv_cv(x))
    assert float(jnp.abs(back - x).max()) < 1e-2


def test_clahe_l_close_to_cv2():
    gray = np.random.RandomState(1).randint(0, 256, (64, 96)).astype(np.uint8)
    ref = cv2.createCLAHE(clipLimit=4.0, tileGridSize=(8, 8)).apply(gray)
    got = np.asarray(clahe_l_channel(jnp.asarray(gray[None], jnp.float32)))[0]
    d = np.abs(ref.astype(float) - got)
    # cv2's residual excess-redistribution loop differs slightly
    assert d.mean() < 3.0
    assert d.max() < 16.0


def test_hsv_and_clahe_transform_ops_run(img):
    cfg = {"backend": "albumentations", "ops": [
        {"name": "HueSaturationValue", "args": {"p": 1.0}},
        {"name": "CLAHE", "args": {"p": 1.0, "tile_grid_size": [8, 8]}},
    ]}
    _, tf = build_transforms(cfg, is_paired=True)
    x = jnp.asarray(np.stack([img, img]), jnp.float32)
    a, b = tf.apply_paired(x, x, jax.random.key(0))
    assert np.allclose(np.asarray(a), np.asarray(b))  # paired consistency
    assert float(a.min()) >= 0.0 and float(a.max()) <= 255.0
    assert not np.allclose(np.asarray(a), np.asarray(x))  # actually did something
