"""torchvision.transforms.functional shim.

``resize`` (the only name the reference uses — ``models/model.py:17,88``,
for optional saved-output resizing) implemented with bilinear+antialias
semantics via torch.nn.functional.
"""

from __future__ import annotations

import torch
import torch.nn.functional as F


def resize(img: torch.Tensor, size):
    h, w = int(size[0]), int(size[1])
    batched = img.ndim == 4
    if not batched:
        img = img[None]
    out = F.interpolate(img.float(), size=(h, w), mode="bilinear", antialias=True)
    return out if batched else out[0]
