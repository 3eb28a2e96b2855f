"""torchvision.transforms shim.

Only ``ToTensor`` is implemented (the reference's no-config default,
``utils/transforms_factory.py:99``); the parity configs use the
albumentations backend so nothing else is exercised.  Unknown names resolve
to constructors that raise at call time.
"""

from __future__ import annotations

import numpy as np
import torch
from PIL import Image


class ToTensor:
    def __call__(self, pic):
        arr = np.asarray(pic, dtype=np.float32) / 255.0
        if arr.ndim == 2:
            arr = arr[:, :, None]
        return torch.from_numpy(arr.transpose(2, 0, 1).copy())


def __getattr__(name):
    class _Unavailable:
        def __init__(self, *args, **kwargs):
            raise RuntimeError(
                f"torchvision.transforms.{name} is unavailable in the parity harness."
            )

    _Unavailable.__name__ = name
    return _Unavailable
