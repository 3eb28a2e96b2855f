#!/usr/bin/env python
"""Convert torchvision / LPIPS pretrained weights to this framework's .npz format.

Run this on a machine with network access and ``torch`` + ``torchvision``
(and optionally ``torchmetrics`` or the ``lpips`` package for the LPIPS lin
weights); this container has neither torchvision nor egress, which is why
the perceptual modules fall back to seeded random features without these
files (see ``ops/perceptual.py``).

Outputs (written into --out, point $MDIE_WEIGHTS_DIR there):
  vgg19_features.npz   keys: conv_{i}/kernel [HWIO], conv_{i}/bias
  lpips_alex.npz       keys: net/conv_{i}/kernel, net/conv_{i}/bias, lin_{k}
  resnet18.npz         keys matching models/resnet.py param tree

Conversion rule: torch conv weights are OIHW; Flax wants HWIO → transpose
(2, 3, 1, 0).  Linear weights are [out, in] → transpose.
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def _conv(w):  # OIHW -> HWIO
    return w.detach().numpy().transpose(2, 3, 1, 0)


def convert_vgg19(out_dir: str) -> None:
    import torchvision.models as tvm

    vgg = tvm.vgg19(weights=tvm.VGG19_Weights.IMAGENET1K_V1).features
    arrays = {}
    for i, layer in enumerate(vgg):
        if layer.__class__.__name__ == "Conv2d":
            arrays[f"conv_{i}/kernel"] = _conv(layer.weight)
            arrays[f"conv_{i}/bias"] = layer.bias.detach().numpy()
    np.savez(os.path.join(out_dir, "vgg19_features.npz"), **arrays)
    print(f"vgg19_features.npz: {len(arrays)} arrays")


def convert_lpips_alex(out_dir: str) -> None:
    import lpips as lpips_pkg  # pip install lpips

    model = lpips_pkg.LPIPS(net="alex")
    arrays = {}
    alex = model.net  # AlexNet backbone wrapper with .slice1..slice5
    tv_index = {0: 0, 3: 3, 6: 6, 8: 8, 10: 10}
    flat = []
    for s in [alex.slice1, alex.slice2, alex.slice3, alex.slice4, alex.slice5]:
        flat.extend(list(s))
    conv_i = 0
    conv_positions = [0, 3, 6, 8, 10]
    for layer in flat:
        if layer.__class__.__name__ == "Conv2d":
            idx = conv_positions[conv_i]
            arrays[f"net/conv_{idx}/kernel"] = _conv(layer.weight)
            arrays[f"net/conv_{idx}/bias"] = layer.bias.detach().numpy()
            conv_i += 1
    for k, lin in enumerate(model.lins):
        w = lin.model[-1].weight.detach().numpy()  # [1, C, 1, 1]
        arrays[f"lin_{k}"] = w.reshape(w.shape[1], 1)
    np.savez(os.path.join(out_dir, "lpips_alex.npz"), **arrays)
    print(f"lpips_alex.npz: {len(arrays)} arrays")


def convert_lpips_vgg(out_dir: str) -> None:
    import lpips as lpips_pkg

    model = lpips_pkg.LPIPS(net="vgg")
    arrays = {}
    # slices hold torchvision vgg16.features modules in order; conv indices
    # must match ops/perceptual.VGG16Taps naming (features index).
    flat = []
    for s in [model.net.slice1, model.net.slice2, model.net.slice3,
              model.net.slice4, model.net.slice5]:
        flat.extend(list(s))
    for idx, layer in enumerate(flat):
        if layer.__class__.__name__ == "Conv2d":
            arrays[f"net/conv_{idx}/kernel"] = _conv(layer.weight)
            arrays[f"net/conv_{idx}/bias"] = layer.bias.detach().numpy()
    for k, lin in enumerate(model.lins):
        w = lin.model[-1].weight.detach().numpy()  # [1, C, 1, 1]
        arrays[f"lin_{k}"] = w.reshape(w.shape[1], 1)
    np.savez(os.path.join(out_dir, "lpips_vgg.npz"), **arrays)
    print(f"lpips_vgg.npz: {len(arrays)} arrays")


def convert_lpips_squeeze(out_dir: str) -> None:
    import lpips as lpips_pkg

    model = lpips_pkg.LPIPS(net="squeeze")
    arrays = {}
    flat = []
    for name in ["slice1", "slice2", "slice3", "slice4", "slice5", "slice6", "slice7"]:
        flat.extend(list(getattr(model.net, name)))
    # flat is squeezenet1_1().features in order; name by features index to
    # match ops/perceptual.SqueezeTaps (conv_0 + fire_{i} submodules).
    for idx, layer in enumerate(flat):
        cls = layer.__class__.__name__
        if cls == "Conv2d":
            arrays[f"net/conv_{idx}/kernel"] = _conv(layer.weight)
            arrays[f"net/conv_{idx}/bias"] = layer.bias.detach().numpy()
        elif cls == "Fire":
            for sub in ("squeeze", "expand1x1", "expand3x3"):
                conv = getattr(layer, sub)
                arrays[f"net/fire_{idx}/{sub}/kernel"] = _conv(conv.weight)
                arrays[f"net/fire_{idx}/{sub}/bias"] = conv.bias.detach().numpy()
    for k, lin in enumerate(model.lins):
        w = lin.model[-1].weight.detach().numpy()
        arrays[f"lin_{k}"] = w.reshape(w.shape[1], 1)
    np.savez(os.path.join(out_dir, "lpips_squeeze.npz"), **arrays)
    print(f"lpips_squeeze.npz: {len(arrays)} arrays")


def convert_resnet18(out_dir: str) -> None:
    import torchvision.models as tvm

    net = tvm.resnet18(weights=tvm.ResNet18_Weights.IMAGENET1K_V1)
    sd = net.state_dict()
    arrays = {}
    for name, t in sd.items():
        v = t.detach().numpy()
        if name.endswith(".weight") and v.ndim == 4:
            arrays[name.replace(".weight", "/kernel").replace(".", "/")] = v.transpose(2, 3, 1, 0)
        elif name.endswith(".weight") and v.ndim == 2:
            arrays[name.replace(".weight", "/kernel").replace(".", "/")] = v.T
        elif name.endswith(".weight") and v.ndim == 1:  # BN scale
            arrays[name.replace(".weight", "/scale").replace(".", "/")] = v
        elif name.endswith(".bias"):
            arrays[name.replace(".bias", "/bias").replace(".", "/")] = v
        elif name.endswith(".running_mean"):
            arrays[name.replace(".running_mean", "/mean").replace(".", "/")] = v
        elif name.endswith(".running_var"):
            arrays[name.replace(".running_var", "/var").replace(".", "/")] = v
    np.savez(os.path.join(out_dir, "resnet18.npz"), **arrays)
    print(f"resnet18.npz: {len(arrays)} arrays")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="weights_npz")
    ap.add_argument(
        "--which", nargs="+",
        default=["vgg19", "lpips_alex", "lpips_vgg", "lpips_squeeze", "resnet18"],
        choices=["vgg19", "lpips_alex", "lpips_vgg", "lpips_squeeze", "resnet18"],
    )
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    if "vgg19" in args.which:
        convert_vgg19(args.out)
    if "lpips_alex" in args.which:
        convert_lpips_alex(args.out)
    if "lpips_vgg" in args.which:
        convert_lpips_vgg(args.out)
    if "lpips_squeeze" in args.which:
        convert_lpips_squeeze(args.out)
    if "resnet18" in args.which:
        convert_resnet18(args.out)
