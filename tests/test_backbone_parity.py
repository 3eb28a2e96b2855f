"""Layer-by-layer activation parity of the perceptual/classifier backbones.

torchvision is absent in this container (zero egress), so exact pretrained
weights cannot be fetched here — instead these tests make the conversion
pipeline airtight so real weights slot in with no further validation work:

  1. build a torch mirror of each torchvision backbone architecture
     (random weights),
  2. convert its state dict with EXACTLY the rules
     ``tools/convert_torch_weights.py`` applies to the real checkpoints
     (OIHW→HWIO transposes, name mapping),
  3. load into the Flax module via ``ops.perceptual._load_npz_into`` and
     assert activations match torch ≤1e-4.

This proves architecture + conversion-rule + loader correctness; the moment
``$MDIE_WEIGHTS_DIR`` holds converted torchvision checkpoints, the identical
code path yields exact perceptual parity (see also
``test_pretrained_weights_load_when_present``).

Reference semantics: torchvision VGG19/AlexNet/VGG16/SqueezeNet1.1 backbones
behind ``/root/reference/utils/loss_factory.py:59-68,191-200`` and
``classification/train_multilabel_classifier.py:117-120`` (ResNet18).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn

from multi_degradation_image_enhancement_tpu.ops.perceptual import (
    AlexNetFeatures,
    LPIPS,
    SqueezeTaps,
    VGG16Taps,
    VGG19Features,
    _load_npz_into,
)

torch.manual_seed(0)


def _conv_w(w):  # OIHW -> HWIO, same rule as tools/convert_torch_weights.py
    return w.detach().numpy().transpose(2, 3, 1, 0)


def _to_nchw(x_nhwc):
    return torch.from_numpy(np.asarray(x_nhwc).transpose(0, 3, 1, 2))


def _from_nchw(t):
    return t.detach().numpy().transpose(0, 2, 3, 1)


def _load(flax_module, example, npz):
    """Init the Flax module and overwrite its params from converted arrays,
    through the same loader production uses (ops.perceptual._load_npz_into)."""
    from flax.core import unfreeze

    variables = flax_module.init(jax.random.key(0), *example)
    params = jax.tree.map(np.asarray, unfreeze(variables["params"]))
    n = _load_npz_into(params, npz)
    assert n == len(npz), f"loaded {n} of {len(npz)} arrays"
    return {"params": params}


# --------------------------------------------------------------------------- #
# VGG19 features prefix (vgg_perceptual loss backbone)
# --------------------------------------------------------------------------- #


def test_vgg19_features_matches_torch_mirror():
    layers, convs = [], {}
    cin = 3
    layout = [
        (64, "conv"), (0, "relu"), (64, "conv"), (0, "relu"), (0, "pool"),
        (128, "conv"), (0, "relu"), (128, "conv"), (0, "relu"), (0, "pool"),
        (256, "conv"), (0, "relu"), (256, "conv"), (0, "relu"), (256, "conv"),
        (0, "relu"), (256, "conv"), (0, "relu"), (0, "pool"),
        (512, "conv"),
    ]
    for i, (ch, kind) in enumerate(layout):
        if kind == "conv":
            m = tnn.Conv2d(cin, ch, 3, padding=1)
            convs[i] = m
            layers.append(m)
            cin = ch
        elif kind == "relu":
            layers.append(tnn.ReLU())
        else:
            layers.append(tnn.MaxPool2d(2, 2))
    tmodel = tnn.Sequential(*layers).eval()

    npz = {}
    for i, m in convs.items():
        npz[f"conv_{i}/kernel"] = _conv_w(m.weight)
        npz[f"conv_{i}/bias"] = m.bias.detach().numpy()

    x = np.random.RandomState(0).rand(2, 32, 48, 3).astype(np.float32)
    fmod = VGG19Features(num_layers=20)
    variables = _load(fmod, [jnp.zeros((1, 32, 48, 3))], npz)
    ours = np.asarray(fmod.apply(variables, jnp.asarray(x)))
    with torch.no_grad():
        theirs = _from_nchw(tmodel(_to_nchw(x)))
    np.testing.assert_allclose(ours, theirs, atol=1e-4, rtol=1e-4)


# --------------------------------------------------------------------------- #
# AlexNet LPIPS taps
# --------------------------------------------------------------------------- #


class _TorchAlexTaps(tnn.Module):
    def __init__(self):
        super().__init__()
        self.c0 = tnn.Conv2d(3, 64, 11, 4, 2)
        self.c3 = tnn.Conv2d(64, 192, 5, 1, 2)
        self.c6 = tnn.Conv2d(192, 384, 3, 1, 1)
        self.c8 = tnn.Conv2d(384, 256, 3, 1, 1)
        self.c10 = tnn.Conv2d(256, 256, 3, 1, 1)
        self.pool = tnn.MaxPool2d(3, 2)

    def forward(self, x):
        taps = []
        x = torch.relu(self.c0(x)); taps.append(x)
        x = self.pool(x)
        x = torch.relu(self.c3(x)); taps.append(x)
        x = self.pool(x)
        x = torch.relu(self.c6(x)); taps.append(x)
        x = torch.relu(self.c8(x)); taps.append(x)
        x = torch.relu(self.c10(x)); taps.append(x)
        return taps


def test_alexnet_taps_match_torch_mirror():
    t = _TorchAlexTaps().eval()
    npz = {}
    for idx, m in [(0, t.c0), (3, t.c3), (6, t.c6), (8, t.c8), (10, t.c10)]:
        npz[f"conv_{idx}/kernel"] = _conv_w(m.weight)
        npz[f"conv_{idx}/bias"] = m.bias.detach().numpy()
    x = np.random.RandomState(1).rand(2, 64, 64, 3).astype(np.float32)
    fmod = AlexNetFeatures()
    variables = _load(fmod, [jnp.zeros((1, 64, 64, 3))], npz)
    ours = fmod.apply(variables, jnp.asarray(x))
    with torch.no_grad():
        theirs = t(_to_nchw(x))
    assert len(ours) == len(theirs) == 5
    for a, b in zip(ours, theirs):
        np.testing.assert_allclose(np.asarray(a), _from_nchw(b), atol=1e-4, rtol=1e-4)


# --------------------------------------------------------------------------- #
# VGG16 LPIPS taps
# --------------------------------------------------------------------------- #


def test_vgg16_taps_match_torch_mirror():
    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M",
           512, 512, 512]
    layers, convs = [], {}
    cin, i = 3, 0
    for ch in cfg:
        if ch == "M":
            layers.append(tnn.MaxPool2d(2, 2)); i += 1
        else:
            m = tnn.Conv2d(cin, ch, 3, padding=1)
            convs[i] = m
            layers.extend([m, tnn.ReLU()])
            cin = ch
            i += 2
    tmodel = tnn.Sequential(*layers).eval()
    tap_idx = {3, 8, 15, 22, 29}

    npz = {}
    for idx, m in convs.items():
        npz[f"conv_{idx}/kernel"] = _conv_w(m.weight)
        npz[f"conv_{idx}/bias"] = m.bias.detach().numpy()

    x = np.random.RandomState(2).rand(1, 64, 64, 3).astype(np.float32)
    fmod = VGG16Taps()
    variables = _load(fmod, [jnp.zeros((1, 64, 64, 3))], npz)
    ours = fmod.apply(variables, jnp.asarray(x))

    taps = []
    with torch.no_grad():
        h = _to_nchw(x)
        for idx, layer in enumerate(tmodel):
            h = layer(h)
            if idx in tap_idx:
                taps.append(h)
    assert len(ours) == len(taps) == 5
    for a, b in zip(ours, taps):
        np.testing.assert_allclose(np.asarray(a), _from_nchw(b), atol=1e-4, rtol=1e-4)


# --------------------------------------------------------------------------- #
# SqueezeNet 1.1 LPIPS taps (ceil-mode pools + Fire modules)
# --------------------------------------------------------------------------- #


class _TorchFire(tnn.Module):
    def __init__(self, cin, squeeze, expand):
        super().__init__()
        self.squeeze = tnn.Conv2d(cin, squeeze, 1)
        self.expand1x1 = tnn.Conv2d(squeeze, expand, 1)
        self.expand3x3 = tnn.Conv2d(squeeze, expand, 3, padding=1)

    def forward(self, x):
        s = torch.relu(self.squeeze(x))
        return torch.cat(
            [torch.relu(self.expand1x1(s)), torch.relu(self.expand3x3(s))], 1
        )


class _TorchSqueezeTaps(tnn.Module):
    def __init__(self):
        super().__init__()
        self.conv_0 = tnn.Conv2d(3, 64, 3, 2)
        self.pool = tnn.MaxPool2d(3, 2, ceil_mode=True)
        self.fire_3 = _TorchFire(64, 16, 64)
        self.fire_4 = _TorchFire(128, 16, 64)
        self.fire_6 = _TorchFire(128, 32, 128)
        self.fire_7 = _TorchFire(256, 32, 128)
        self.fire_9 = _TorchFire(256, 48, 192)
        self.fire_10 = _TorchFire(384, 48, 192)
        self.fire_11 = _TorchFire(384, 64, 256)
        self.fire_12 = _TorchFire(512, 64, 256)

    def forward(self, x):
        taps = []
        x = torch.relu(self.conv_0(x)); taps.append(x)
        x = self.fire_4(self.fire_3(self.pool(x))); taps.append(x)
        x = self.fire_7(self.fire_6(self.pool(x))); taps.append(x)
        x = self.fire_9(self.pool(x)); taps.append(x)
        x = self.fire_10(x); taps.append(x)
        x = self.fire_11(x); taps.append(x)
        x = self.fire_12(x); taps.append(x)
        return taps


@pytest.mark.parametrize("hw", [(64, 64), (65, 70)])  # odd sizes hit ceil-mode pools
def test_squeeze_taps_match_torch_mirror(hw):
    t = _TorchSqueezeTaps().eval()
    npz = {
        "conv_0/kernel": _conv_w(t.conv_0.weight),
        "conv_0/bias": t.conv_0.bias.detach().numpy(),
    }
    for i in (3, 4, 6, 7, 9, 10, 11, 12):
        fire = getattr(t, f"fire_{i}")
        for sub in ("squeeze", "expand1x1", "expand3x3"):
            conv = getattr(fire, sub)
            npz[f"fire_{i}/{sub}/kernel"] = _conv_w(conv.weight)
            npz[f"fire_{i}/{sub}/bias"] = conv.bias.detach().numpy()

    h, w = hw
    x = np.random.RandomState(3).rand(1, h, w, 3).astype(np.float32)
    fmod = SqueezeTaps()
    variables = _load(fmod, [jnp.zeros((1, h, w, 3))], npz)
    ours = fmod.apply(variables, jnp.asarray(x))
    with torch.no_grad():
        theirs = t(_to_nchw(x))
    assert len(ours) == len(theirs) == 7
    for a, b in zip(ours, theirs):
        np.testing.assert_allclose(np.asarray(a), _from_nchw(b), atol=1e-4, rtol=1e-4)


# --------------------------------------------------------------------------- #
# LPIPS end-to-end formula vs an independent torch implementation
# --------------------------------------------------------------------------- #


def test_lpips_alex_formula_matches_torch():
    """Full LPIPS (scaling layer + unit-norm + |lin| + spatial mean) against a
    from-the-paper torch implementation sharing only the converted weights."""
    t = _TorchAlexTaps().eval()
    npz = {}
    for idx, m in [(0, t.c0), (3, t.c3), (6, t.c6), (8, t.c8), (10, t.c10)]:
        npz[f"net/conv_{idx}/kernel"] = _conv_w(m.weight)
        npz[f"net/conv_{idx}/bias"] = m.bias.detach().numpy()
    rng = np.random.RandomState(4)
    channels = (64, 192, 384, 256, 256)
    lins = [rng.rand(c, 1).astype(np.float32) * 0.1 for c in channels]
    for k, lin in enumerate(lins):
        npz[f"lin_{k}"] = lin

    x = rng.rand(2, 64, 64, 3).astype(np.float32)
    y = rng.rand(2, 64, 64, 3).astype(np.float32)

    fmod = LPIPS(net_type="alex")
    variables = _load(fmod, [jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 64, 64, 3))], npz)
    # LPIPS returns per-sample distances [B]; compare the batch means
    ours = float(jnp.mean(fmod.apply(variables, jnp.asarray(x), jnp.asarray(y))))

    shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)
    with torch.no_grad():
        fx = t((_to_nchw(x) - shift) / scale)
        fy = t((_to_nchw(y) - shift) / scale)
        total = torch.zeros(2)
        for k, (ax, ay) in enumerate(zip(fx, fy)):
            nx = ax / torch.sqrt((ax**2).sum(1, keepdim=True) + 1e-10)
            ny = ay / torch.sqrt((ay**2).sum(1, keepdim=True) + 1e-10)
            d = (nx - ny) ** 2
            w = torch.from_numpy(np.abs(lins[k])).view(1, -1, 1, 1)
            total = total + (d * w).sum(1).mean((1, 2))
        theirs = float(total.mean())
    assert ours == pytest.approx(theirs, rel=1e-4)


def test_lpips_vgg_and_squeeze_run():
    """vgg/squeeze LPIPS backbones instantiate and evaluate (capability parity
    with torchmetrics net_type; reference utils/loss_factory.py:195)."""
    x = jnp.zeros((1, 64, 64, 3))
    for net in ("vgg", "squeeze"):
        mod = LPIPS(net_type=net)
        variables = mod.init(jax.random.key(0), x, x)
        val = float(jnp.mean(mod.apply(variables, x, jnp.ones_like(x) * 0.5)))
        assert np.isfinite(val) and val >= 0.0


# --------------------------------------------------------------------------- #
# Real converted weights (skipped until MDIE_WEIGHTS_DIR is provisioned)
# --------------------------------------------------------------------------- #


@pytest.mark.parametrize(
    "npz_name", ["vgg19_features.npz", "lpips_alex.npz", "lpips_vgg.npz",
                 "lpips_squeeze.npz", "resnet18.npz"]
)
def test_pretrained_weights_load_when_present(npz_name):
    wdir = os.environ.get("MDIE_WEIGHTS_DIR")
    path = os.path.join(wdir, npz_name) if wdir else None
    if not (path and os.path.isfile(path)):
        pytest.skip(f"{npz_name} not provisioned (MDIE_WEIGHTS_DIR)")
    from multi_degradation_image_enhancement_tpu.ops import perceptual

    npz = dict(np.load(path))
    assert npz, "empty weight archive"
    if npz_name == "vgg19_features.npz":
        mod = VGG19Features(num_layers=20)
        variables = perceptual.init_frozen_params(
            mod, [jnp.zeros((1, 32, 32, 3))], npz_name
        )
        out = mod.apply(variables, jnp.ones((1, 32, 32, 3)) * 0.5)
        assert bool(jnp.all(jnp.isfinite(out)))
    elif npz_name.startswith("lpips_"):
        net = npz_name[len("lpips_"):-len(".npz")]
        mod = LPIPS(net_type=net)
        variables = perceptual.init_frozen_params(
            mod, [jnp.zeros((1, 64, 64, 3))] * 2, npz_name
        )
        val = float(mod.apply(variables, jnp.zeros((1, 64, 64, 3)),
                              jnp.ones((1, 64, 64, 3))))
        assert np.isfinite(val)
    assert perceptual.weight_status()[npz_name] == "pretrained"
