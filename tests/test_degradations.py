"""Golden tests: on-device degradations vs the reference's OpenCV math.

Each op is compared against the exact cv2 call chain the reference
generators use (generate_paired_degradation_dataset.py:107-191), on random
uint8 images.  Tolerances reflect uint8 rounding differences only.
"""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")
import jax.numpy as jnp  # noqa: E402
import jax  # noqa: E402

from multi_degradation_image_enhancement_tpu.ops import degradations as D  # noqa: E402


@pytest.fixture(scope="module")
def img():
    rng = np.random.RandomState(0)
    return rng.randint(0, 256, (64, 96, 3)).astype(np.uint8)


def _maxdiff(ref, got):
    return np.abs(ref.astype(int) - np.asarray(got).astype(int)).max()


@pytest.mark.parametrize("ki,k", [(0, 3), (1, 5), (2, 7), (3, 9)])
def test_gaussian_blur_matches_cv2(img, ki, k):
    ref = cv2.GaussianBlur(img, (k, k), 0)
    got = D.gaussian_blur(jnp.asarray(img[None], jnp.float32), jnp.array([ki]))[0]
    assert _maxdiff(ref, got) <= 1


@pytest.mark.parametrize("k", [5, 8, 25])
def test_motion_blur_matches_cv2(img, k):
    kernel = np.zeros((k, k), np.float32)
    kernel[k // 2, :] = 1.0
    kernel /= kernel.sum()
    ref = cv2.filter2D(img, -1, kernel)
    got = D.motion_blur(jnp.asarray(img[None], jnp.float32), jnp.array([k]))[0]
    assert _maxdiff(ref, got) <= 1


@pytest.mark.parametrize("f", [4, 7, 16])
def test_pixelation_matches_cv2(img, f):
    h, w = img.shape[:2]
    small = cv2.resize(img, (max(1, w // f), max(1, h // f)), interpolation=cv2.INTER_LINEAR)
    ref = cv2.resize(small, (w, h), interpolation=cv2.INTER_NEAREST)
    got = D.pixelate(jnp.asarray(img[None], jnp.float32), jnp.array([f]))[0]
    assert _maxdiff(ref, got) <= 1


def test_scalar_ops_match_numpy(img):
    x = jnp.asarray(img[None], jnp.float32)
    ref = np.clip(img.astype(np.float32) * 0.2, 0, 255).astype(np.uint8)
    assert _maxdiff(ref, D.low_light(x, jnp.array([0.2]))) == 0
    ref = np.clip(img.astype(np.float32) * 2.1, 0, 255).astype(np.uint8)
    assert _maxdiff(ref, D.high_light(x, jnp.array([2.1]))) == 0
    m = img.mean(axis=(0, 1), keepdims=True).astype(np.float32)
    ref = np.clip(0.5 * img.astype(np.float32) + 0.5 * m, 0, 255).astype(np.uint8)
    assert _maxdiff(ref, D.low_contrast(x, jnp.array([0.5]))) == 0
    gains = np.array([0.7, 1.0, 1.3], np.float32)
    ref = np.clip(img.astype(np.float32) * gains, 0, 255).astype(np.uint8)
    assert _maxdiff(ref, D.color_distortion(x, jnp.asarray(gains[None]))) == 0


def test_noise_statistics():
    x = jnp.full((1, 64, 96, 3), 128.0, jnp.float32)
    out = D.add_gaussian_noise(x, jnp.array([30.0]), jax.random.key(0))
    resid = np.asarray(out)[0] - 128.0
    assert 25.0 < resid.std() < 35.0
    assert abs(resid.mean()) < 2.0


def test_jpeg_matches_libjpeg_strength(img):
    natural = cv2.GaussianBlur(img, (5, 5), 0)

    def psnr(a, b):
        mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
        return 10 * np.log10(255.0**2 / mse)

    for q in (10, 30, 50):
        ok, enc = cv2.imencode(
            ".jpg", cv2.cvtColor(natural, cv2.COLOR_RGB2BGR),
            [int(cv2.IMWRITE_JPEG_QUALITY), q],
        )
        ref = cv2.cvtColor(cv2.imdecode(enc, 1), cv2.COLOR_BGR2RGB)
        got = np.asarray(
            D.jpeg_compress(jnp.asarray(natural[None], jnp.float32), jnp.array([q]))
        )[0]
        # pixel-level closeness to real libjpeg output
        assert psnr(ref, got) > 35.0
        # identical degradation *strength* (the parity that matters, SURVEY §7)
        assert abs(psnr(ref, natural) - psnr(got, natural)) < 0.35


def test_sampled_param_ranges():
    key = jax.random.key(0)
    p = D.sample_params("blur", key, 100)
    assert set(np.unique(np.asarray(p["k_idx"]))) <= {0, 1, 2, 3}
    p = D.sample_params("jpeg", key, 100)
    q = np.asarray(p["quality"])
    assert q.min() >= 10 and q.max() <= 50
    p = D.sample_params("motion_blur", key, 100)
    k = np.asarray(p["k"])
    assert k.min() >= 5 and k.max() <= 25


def test_degrade_batch_domain():
    clean = jnp.asarray(np.random.RandomState(0).randint(0, 256, (2, 32, 32, 3)), jnp.float32)
    for name in D.DEGRADATIONS:
        deg01, clean01 = D.degrade_batch(clean, name, jax.random.key(1))
        assert deg01.shape == clean.shape
        assert float(deg01.min()) >= 0.0 and float(deg01.max()) <= 1.0
        assert np.allclose(np.asarray(clean01), np.asarray(clean) / 255.0)


def test_unknown_degradation_raises():
    with pytest.raises(ValueError):
        D.apply_degradation("speckle", jnp.zeros((1, 8, 8, 3)), jax.random.key(0))
