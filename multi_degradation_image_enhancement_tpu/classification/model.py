"""Multi-head degradation classifier: ResNet-18 backbone + class & severity heads.

Parity: reference ``classification/train_multilabel_classifier.py:117-131``
(torchvision resnet18, fc→Identity, two Linear heads over the 512-d pooled
feature).  Pretrained ImageNet weights load from ``resnet18.npz`` when
``$MDIE_WEIGHTS_DIR`` provides them (see ``tools/convert_torch_weights.py``);
otherwise the backbone trains from a seeded random init.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from multi_degradation_image_enhancement_tpu.models.resnet import (
    ResNet18Features,
    load_torchvision_npz,
)

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


class MultiHeadClassifier(nn.Module):
    num_classes: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> Tuple[jax.Array, jax.Array]:
        feat = ResNet18Features(dtype=self.dtype, name="backbone")(x, train=train)
        cls_logits = nn.Dense(self.num_classes, name="head_cls")(feat.astype(jnp.float32))
        sev_logits = nn.Dense(self.num_classes, name="head_sev")(feat.astype(jnp.float32))
        return cls_logits, sev_logits


def init_classifier_variables(
    model: MultiHeadClassifier,
    input_hw: Tuple[int, int] = (256, 384),
    seed: int = 42,
    pretrained_backbone: bool = True,
) -> Dict[str, Any]:
    """Init variables, loading converted torchvision weights when available."""
    variables = model.init(
        {"params": jax.random.key(seed)},
        jnp.zeros((1, input_hw[0], input_hw[1], 3), jnp.float32),
        train=False,
    )
    wdir = os.environ.get("MDIE_WEIGHTS_DIR")
    path = os.path.join(wdir, "resnet18.npz") if wdir else None
    if pretrained_backbone and path and os.path.isfile(path):
        npz = dict(np.load(path))
        from flax.core import unfreeze

        var_dict = unfreeze(variables)
        backbone_vars = {
            "params": var_dict["params"]["backbone"],
            "batch_stats": var_dict["batch_stats"]["backbone"],
        }
        loaded = load_torchvision_npz(backbone_vars, npz)
        var_dict["params"]["backbone"] = loaded["params"]
        var_dict["batch_stats"]["backbone"] = loaded["batch_stats"]
        print(f"[classifier] loaded pretrained backbone from {path}")
        return var_dict
    if pretrained_backbone:
        print(
            "[classifier] resnet18.npz not found"
            f" (MDIE_WEIGHTS_DIR={wdir!r}); backbone trains from random init."
        )
    return variables
