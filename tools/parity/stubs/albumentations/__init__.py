"""Minimal albumentations API shim for the parity harness (our own code).

Implements just the ops the parity configs use — Resize, HorizontalFlip,
VerticalFlip, RandomRotate90, Normalize — plus ``Compose`` with
``additional_targets`` paired-key sharing, with albumentations' documented
semantics (cv2 bilinear resize; /255-then-normalize with
max_pixel_value=255; one random draw shared across image+target).  The
reference builds its pipelines from these names
(``utils/transforms_factory.py:50-86`` in /root/reference).
"""

from __future__ import annotations

import random
from typing import Dict, List, Optional

import cv2
import numpy as np


class _Op:
    """Base: deterministic unless the subclass draws from ``rng``."""

    p = 1.0

    def sample(self, rng: random.Random) -> dict:
        return {"apply": rng.random() < self.p}

    def __call__(self, img: np.ndarray, draw: dict) -> np.ndarray:
        raise NotImplementedError


class Resize(_Op):
    def __init__(self, height: int, width: int):
        self.height, self.width = height, width

    def sample(self, rng):
        return {"apply": True}

    def __call__(self, img, draw):
        return cv2.resize(img, (self.width, self.height), interpolation=cv2.INTER_LINEAR)


class HorizontalFlip(_Op):
    def __init__(self, p: float = 0.5):
        self.p = p

    def __call__(self, img, draw):
        return np.ascontiguousarray(img[:, ::-1]) if draw["apply"] else img


class VerticalFlip(_Op):
    def __init__(self, p: float = 0.5):
        self.p = p

    def __call__(self, img, draw):
        return np.ascontiguousarray(img[::-1]) if draw["apply"] else img


class RandomRotate90(_Op):
    def __init__(self, p: float = 0.5):
        self.p = p

    def sample(self, rng):
        return {"apply": rng.random() < self.p, "k": rng.randint(1, 3)}

    def __call__(self, img, draw):
        return np.ascontiguousarray(np.rot90(img, draw["k"])) if draw["apply"] else img


class Normalize(_Op):
    def __init__(self, mean, std, max_pixel_value: float = 255.0):
        self.mean = np.asarray(mean, np.float32)
        self.std = np.asarray(std, np.float32)
        self.maxv = max_pixel_value

    def sample(self, rng):
        return {"apply": True}

    def __call__(self, img, draw):
        img = img.astype(np.float32) / self.maxv
        return (img - self.mean) / self.std


class Compose:
    """Apply ops in order; one random draw per op shared across all targets."""

    def __init__(self, ops: List[_Op], additional_targets: Optional[Dict[str, str]] = None):
        self.ops = list(ops)
        self.additional_targets = dict(additional_targets or {})
        self._rng = random.Random()

    def __call__(self, **targets) -> Dict[str, np.ndarray]:
        keys = ["image"] + [k for k in self.additional_targets if k in targets]
        draws = [op.sample(self._rng) for op in self.ops]
        out = {}
        for k in keys:
            img = targets[k]
            for op, draw in zip(self.ops, draws):
                img = op(img, draw)
            out[k] = img
        return out
