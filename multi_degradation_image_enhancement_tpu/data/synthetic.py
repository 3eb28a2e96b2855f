"""On-device synthetic paired dataset: degrade clean batches in HBM each step.

This is the architectural win the reference leaves on the table (SURVEY.md
§7 design stance): instead of offline OpenCV generation → PNG → DataLoader
workers → H2D copies, clean images stream to the device once and the paired
(degraded, clean) batch is synthesized *on device* by ``ops.degradations``
inside the jitted input pipeline.

Two clean-image sources:
  * ``clean_root``: a directory of images (e.g. the output of
    ``datasets_generation.select_clean_images``), decoded once on host;
  * procedural (no root): deterministic band-limited random images — useful
    for tests and throughput benchmarking without any dataset on disk.

Config usage (drop-in for a dataset block):
    {"name": ["data.synthetic", "SyntheticPairedDataset"],
     "args": {"degradation": "noise", "n_images": 512,
              "height": 256, "width": 384, "transform": {...}}}
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Tuple

import numpy as np

from multi_degradation_image_enhancement_tpu.data.dataset import _list_images, _load_rgb
from multi_degradation_image_enhancement_tpu.data.transforms import build_transforms
from multi_degradation_image_enhancement_tpu.ops.degradations import DEGRADATIONS


def _procedural_clean(n: int, h: int, w: int, seed: int = 42) -> np.ndarray:
    """Deterministic band-limited random RGB images, uint8 [n,h,w,3].

    Smooth low-frequency content (sum of a few random 2-D cosines) plus mild
    texture — enough structure for restoration losses/metrics to behave like
    natural images, with zero disk or network dependencies.
    """
    rng = np.random.RandomState(seed)
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    imgs = np.empty((n, h, w, 3), np.float32)
    for i in range(n):
        img = np.zeros((h, w, 3), np.float32)
        for _ in range(6):
            fy, fx = rng.uniform(0.5, 6.0, 2)
            phase = rng.uniform(0, 2 * np.pi, 3)
            amp = rng.uniform(10, 60, 3)
            base = 2 * np.pi * (fy * yy / h + fx * xx / w)
            img += amp * np.cos(base[..., None] + phase)
        img += rng.normal(0, 6.0, (h, w, 3))
        img = img - img.min()
        img = img / max(img.max(), 1e-6) * 255.0
        imgs[i] = img
    return imgs.astype(np.uint8)


class SyntheticPairedDataset:
    """Clean-image source whose pairs are synthesized on device by the loader.

    The loader detects ``device_degrade`` and runs
    ``ops.degradations.apply_degradation(degradation, clean, key)`` on the
    batched clean images, then the paired device transform.
    """

    paired = True

    def __init__(
        self,
        degradation: str = "noise",
        clean_root: Optional[str] = None,
        n_images: int = 512,
        height: int = 256,
        width: int = 384,
        seed: int = 42,
        transform: Optional[Dict] = None,
    ):
        if degradation not in DEGRADATIONS:
            raise ValueError(
                f"Unknown degradation '{degradation}'. Available: {DEGRADATIONS}"
            )
        self.device_degrade = degradation
        self.backend, self.transform = build_transforms(transform, is_paired=True)

        if clean_root:
            files = [os.path.join(clean_root, f) for f in _list_images(clean_root)]
            if not files:
                raise RuntimeError(f"No images found in {clean_root}")
            self.files: Optional[List[str]] = files
            self._clean: Optional[np.ndarray] = None
            self._n = len(files)
        else:
            hw = self.transform.target_hw or (height, width)
            self.files = None
            self._clean = _procedural_clean(n_images, hw[0], hw[1], seed)
            self._n = n_images

    def __len__(self) -> int:
        return self._n

    def load_single(self, idx: int) -> np.ndarray:
        if self._clean is not None:
            return self._clean[idx]
        return _load_rgb(self.files[idx], self.transform.target_hw)
