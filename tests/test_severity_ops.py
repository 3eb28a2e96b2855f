"""Severity-parameterized degradations vs the reference classifier-generator math."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from multi_degradation_image_enhancement_tpu.ops.severity import (  # noqa: E402
    apply_severity,
    motion_blur_rotated,
    rotated_line_kernel,
)


@pytest.fixture(scope="module")
def img():
    return np.random.RandomState(0).randint(0, 256, (64, 96, 3)).astype(np.uint8)


def _cv2_rot_kernel(k, angle):
    kernel = np.zeros((k, k), np.float32)
    kernel[k // 2, :] = 1.0
    M = cv2.getRotationMatrix2D((k / 2.0, k / 2.0), angle, 1.0)
    out = cv2.warpAffine(kernel, M, (k, k), flags=cv2.INTER_LINEAR)
    s = out.sum()
    return out / s if s > 1e-8 else out


@pytest.mark.parametrize("k,ang", [(5, 30.0), (11, 77.0), (9, 90.0), (25, 120.0), (7, 0.0)])
def test_rotated_kernel_matches_cv2(k, ang):
    ours = np.asarray(rotated_line_kernel(jnp.array([k]), jnp.array([ang])))[0]
    lo = (25 - k) // 2
    ref = np.pad(_cv2_rot_kernel(k, ang), ((lo, 25 - k - lo), (lo, 25 - k - lo)))
    assert np.abs(ours - ref).max() < 2e-5


def test_rotated_motion_blur_op_matches_cv2(img):
    for k, ang in [(9, 45.0), (15, 135.0), (9, 90.0)]:
        ref = cv2.filter2D(img, -1, _cv2_rot_kernel(k, ang))
        got = motion_blur_rotated(
            jnp.asarray(img[None], jnp.float32), jnp.array([k]), jnp.array([ang])
        )[0]
        assert np.abs(ref.astype(int) - np.asarray(got).astype(int)).max() <= 1


def test_severity_parameter_mappings(img):
    x = jnp.asarray(img[None], jnp.float32)
    key = jax.random.key(0)

    # low_light: factor = 0.45 − 0.40·sev (reference generate_classifier:230-235)
    out, p = apply_severity("low_light", x, jnp.array([1.0]), key)
    assert float(p["factor"][0]) == pytest.approx(0.05)
    ref = np.clip(img.astype(np.float32) * 0.05, 0, 255).astype(np.uint8)
    # float32 (0.45 − 0.40·1.0) = 0.049999997 → ±1 at truncation boundaries
    assert np.abs(ref.astype(int) - np.asarray(out[0]).astype(int)).max() <= 1

    # noise σ = 5 + 45·sev
    _, p = apply_severity("noise", x, jnp.array([0.5]), key)
    assert float(p["std"][0]) == pytest.approx(27.5)

    # jpeg quality = round(80 − 70·sev)
    _, p = apply_severity("jpeg", x, jnp.array([0.0]), key)
    assert float(p["quality"][0]) == 80

    # blur k from {3,5,7,9} by round(sev·3)
    _, p = apply_severity("blur", x, jnp.array([0.0]), key)
    assert int(p["k"][0]) == 3
    _, p = apply_severity("blur", x, jnp.array([1.0]), key)
    assert int(p["k"][0]) == 9

    # color_distortion at sev=0 must be identity gains
    out, p = apply_severity("color_distortion", x, jnp.array([0.0]), key)
    assert np.allclose(np.asarray(p["gains"]), 1.0)

    with pytest.raises(ValueError):
        apply_severity("zorp", x, jnp.array([0.5]), key)
