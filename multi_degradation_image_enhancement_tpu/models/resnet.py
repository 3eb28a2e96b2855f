"""ResNet-18 backbone in Flax (NHWC), torchvision-compatible.

Backbone for the multi-label degradation classifier (reference
``classification/train_multilabel_classifier.py:117-131`` uses torchvision
``resnet18(IMAGENET1K_V1)`` with ``fc → Identity``).  Structure and
parameter layout mirror torchvision so ``tools/convert_torch_weights.py``
output (``resnet18.npz``) loads directly; in environments without converted
weights the backbone falls back to seeded random init (train-from-scratch).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class BasicBlock(nn.Module):
    features: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        identity = x
        out = nn.Conv(self.features, (3, 3), strides=(self.stride, self.stride),
                      padding=((1, 1), (1, 1)), use_bias=False, dtype=self.dtype,
                      name="conv1")(x)
        out = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                           dtype=jnp.float32 if train else self.dtype, name="bn1")(out)
        out = nn.relu(out)
        out = nn.Conv(self.features, (3, 3), padding=((1, 1), (1, 1)),
                      use_bias=False, dtype=self.dtype, name="conv2")(out)
        out = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                           dtype=jnp.float32 if train else self.dtype, name="bn2")(out)
        if self.stride != 1 or x.shape[-1] != self.features:
            identity = nn.Conv(self.features, (1, 1), strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype, name="downsample_conv")(x)
            identity = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                    dtype=jnp.float32 if train else self.dtype, name="downsample_bn")(identity)
        return nn.relu(out + identity)


class ResNet18Features(nn.Module):
    """torchvision resnet18 minus the fc head: NHWC image → [B, 512] features."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=jnp.float32 if train else self.dtype, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for li, (features, stride) in enumerate(
            [(64, 1), (128, 2), (256, 2), (512, 2)], start=1
        ):
            for bi in range(2):
                x = BasicBlock(
                    features, stride if bi == 0 else 1, dtype=self.dtype,
                    name=f"layer{li}_{bi}",
                )(x, train=train)
        return jnp.mean(x, axis=(1, 2))  # global average pool → [B, 512]


def _torchvision_key_to_path(key: str) -> Tuple[str, ...]:
    """Map converter npz keys ('layer1/0/conv1/kernel') to Flax param paths."""
    parts = key.split("/")
    if parts[0].startswith("layer"):
        block = f"{parts[0]}_{parts[1]}"
        rest = parts[2:]
        if rest[0] == "downsample":
            rest = [f"downsample_{'conv' if rest[1] == '0' else 'bn'}"] + rest[2:]
        return tuple([block] + rest)
    return tuple(parts)


def load_torchvision_npz(
    variables: Dict[str, Any], npz: Dict[str, np.ndarray]
) -> Dict[str, Any]:
    """Load a converted torchvision resnet18 state into init'd variables.

    npz keys: conv kernels (HWIO), BN scale/bias (params) and mean/var
    (batch_stats); the fc head is ignored (the classifier has its own).
    Returns a new {params, batch_stats} dict.
    """
    import copy

    out = copy.deepcopy(jax.tree.map(np.asarray, dict(variables)))
    loaded = 0
    for key, arr in npz.items():
        if key.startswith("fc/"):
            continue
        path = _torchvision_key_to_path(key)
        leaf = path[-1]
        collection = "batch_stats" if leaf in ("mean", "var") else "params"
        node = out[collection]
        try:
            for p in path[:-1]:
                node = node[p]
        except KeyError:
            continue
        if collection == "params":
            if leaf not in node:
                continue
            if node[leaf].shape != arr.shape:
                raise ValueError(f"{key}: shape {arr.shape} vs {node[leaf].shape}")
            node[leaf] = arr
        else:
            if leaf == "mean" and "mean" in node:
                node["mean"] = arr
            elif leaf == "var" and "var" in node:
                node["var"] = arr
        loaded += 1
    if loaded == 0:
        raise ValueError("No resnet18 weights matched the parameter tree")
    return jax.tree.map(jnp.asarray, out)
