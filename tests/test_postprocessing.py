"""Post-processing ops vs torch oracles reproducing the reference math."""

import numpy as np
import pytest
import jax.numpy as jnp

from multi_degradation_image_enhancement_tpu.ops import post_processing as pp


@pytest.fixture(scope="module")
def x():
    return np.random.RandomState(3).rand(2, 24, 32, 3).astype(np.float32)


def _torch_oracle(name, x_nchw, **kw):
    """Reference math (utils/post_processing.py:5-77) as an independent oracle."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    t = torch.from_numpy(x_nchw)
    if name == "enhance_contrast":
        m = t.mean(dim=(2, 3), keepdim=True)
        return torch.clamp((t - m) * kw["contrast_factor"] + m, 0, 1).numpy()
    if name == "enhance_color":
        g = (0.2989 * t[:, 0] + 0.5870 * t[:, 1] + 0.1140 * t[:, 2]).unsqueeze(1)
        return torch.clamp(g + kw["saturation_factor"] * (t - g), 0, 1).numpy()
    if name == "sharpen":
        k = torch.tensor([[0.0, -1, 0], [-1, 5, -1], [0, -1, 0]])
        k = k * kw["strength"] + torch.eye(3)
        k = (k / k.sum()).reshape(1, 1, 3, 3).repeat(3, 1, 1, 1)
        return torch.clamp(F.conv2d(t, k, padding=1, groups=3), 0, 1).numpy()
    if name == "soft_denoise":
        k = torch.tensor([[1.0, 2, 1], [2, 4, 2], [1, 2, 1]]) / 16.0
        k = k.reshape(1, 1, 3, 3).repeat(3, 1, 1, 1)
        blurred = F.conv2d(t, k, padding=1, groups=3)
        return torch.clamp((1 - kw["sigma"]) * t + kw["sigma"] * blurred, 0, 1).numpy()
    raise ValueError(name)


@pytest.mark.parametrize(
    "name,kw",
    [
        ("enhance_contrast", {"contrast_factor": 1.07}),
        ("enhance_color", {"saturation_factor": 1.5}),
        ("sharpen", {"strength": 0.6}),
        ("soft_denoise", {"sigma": 0.3}),
    ],
)
def test_ops_match_reference_math(x, name, kw):
    ref = _torch_oracle(name, x.transpose(0, 3, 1, 2), **kw).transpose(0, 2, 3, 1)
    got = np.asarray(getattr(pp, name)(jnp.asarray(x), **kw))
    assert np.abs(ref - got).max() < 1e-5


def test_factory_chain_and_errors(x):
    xj = jnp.asarray(x)
    cfg = {"enabled": True, "ops": [
        {"name": "enhance_contrast", "args": {"contrast_factor": 1.03}},
        {"name": "enhance_color", "args": {"saturation_factor": 1.55}},
    ]}
    out = pp.apply_postprocessing(xj, cfg)
    step1 = pp.enhance_contrast(xj, 1.03)
    expected = pp.enhance_color(step1, 1.55)
    assert np.allclose(np.asarray(out), np.asarray(expected))

    assert pp.apply_postprocessing(xj, {"enabled": False}) is xj
    with pytest.raises(ValueError):
        pp.apply_postprocessing(xj, {"enabled": True, "ops": [{"name": "zorp"}]})
