"""torch-default re-initialization statistics (models/torch_init.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from multi_degradation_image_enhancement_tpu.models.cdan import CDAN
from multi_degradation_image_enhancement_tpu.models.torch_init import torch_reinit


def _init_params():
    m = CDAN()
    v = m.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        jnp.zeros((1, 32, 48, 3), jnp.float32),
        train=True,
    )
    return v


def test_torch_reinit_statistics():
    v = _init_params()
    p = torch_reinit(v["params"], jax.random.key(7))

    # encoder conv2: Conv2d 64->128 k3 — fan_in = 9*64, U(±1/√fan)
    k = p["encoder"]["conv2"]["Conv_0"]["kernel"]
    bound = 1.0 / np.sqrt(9 * 64)
    kn = np.asarray(k)
    assert kn.min() >= -bound - 1e-7 and kn.max() <= bound - 1e-9 + 1e-7
    # uniform(±b) std = b/√3; 9*64*128 samples → tight
    assert abs(kn.std() - bound / np.sqrt(3)) < 0.05 * bound
    b = np.asarray(p["encoder"]["conv2"]["Conv_0"]["bias"])
    assert b.min() >= -bound and b.max() <= bound and b.std() > 0

    # decoder de1_conv: reference ConvTranspose2d(512→256) — torch fan_in
    # quirk uses OUTPUT channels: fan = 9*256, not 9*512
    k = np.asarray(p["decoder"]["de1_conv"]["kernel"])
    bound_t = 1.0 / np.sqrt(9 * 256)
    assert k.max() <= bound_t + 1e-7
    assert k.max() > bound_t * 0.98  # and actually fills the range
    assert abs(k.std() - bound_t / np.sqrt(3)) < 0.05 * bound_t

    # CBAM MLP fc1: Linear 512→32 — fan_in = 512
    k = np.asarray(p["bottleneck"]["ChannelGate_0"]["fc1"]["kernel"])
    bound_l = 1.0 / np.sqrt(512)
    assert k.max() <= bound_l + 1e-7 and abs(k.std() - bound_l / np.sqrt(3)) < 0.1 * bound_l

    # BatchNorm untouched (scale ones, bias zeros)
    bn = p["encoder"]["conv2"]["BatchNorm_0"]
    assert np.all(np.asarray(bn["scale"]) == 1.0)
    assert np.all(np.asarray(bn["bias"]) == 0.0)


def test_torch_reinit_deterministic_and_structure():
    v = _init_params()
    p1 = torch_reinit(v["params"], jax.random.key(3))
    p2 = torch_reinit(v["params"], jax.random.key(3))
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # identical tree structure & shapes/dtypes
    s1 = jax.tree.structure(v["params"])
    s2 = jax.tree.structure(p1)
    assert s1 == s2
    for a, b in zip(jax.tree.leaves(v["params"]), jax.tree.leaves(p1)):
        assert a.shape == b.shape and a.dtype == b.dtype
    # different key → different draw
    p3 = torch_reinit(v["params"], jax.random.key(4))
    diffs = [
        float(np.abs(np.asarray(a) - np.asarray(b)).max())
        for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p3))
    ]
    assert max(diffs) > 0
