"""albumentations.pytorch.ToTensorV2 shim: HWC numpy → CHW torch tensor."""

from __future__ import annotations

import numpy as np
import torch

from . import _Op


class ToTensorV2(_Op):
    def sample(self, rng):
        return {"apply": True}

    def __call__(self, img: np.ndarray, draw: dict) -> torch.Tensor:
        if img.ndim == 2:
            img = img[:, :, None]
        return torch.from_numpy(np.ascontiguousarray(img.transpose(2, 0, 1)))
