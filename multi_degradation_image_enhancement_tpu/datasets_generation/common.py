"""Shared host-side helpers for the offline dataset generators.

These are CPU/IO tools, run once to materialize datasets on disk — the same
role as the reference's ``datasets_generation/`` scripts (SURVEY.md §2
C11/C14/C15).  The training path doesn't need them (degradations synthesize
on device, ``data.synthetic``); they exist for parity checks against the
reference's on-disk datasets and for the classifier workload.

Behavioral contracts kept from the reference:
  * letterbox resize to (256, 384) with RGB(128,128,128) padding, cv2
    INTER_AREA (``generate_paired_degradation_dataset.py:81-101``);
  * persisted split JSONs keyed by seed/ratios;
  * md5-stable per-file / per-variant RNG streams.
"""

from __future__ import annotations

import hashlib
import json
import os
import random
from typing import Dict, List, Tuple

import numpy as np

IMG_EXTS = (".jpg", ".jpeg", ".png", ".bmp", ".tif", ".tiff", ".webp")

TARGET_SIZE = (256, 384)  # (H, W)
PADDING_COLOR_RGB = (128, 128, 128)


def list_images(folder: str) -> List[str]:
    return sorted(
        f
        for f in os.listdir(folder)
        if os.path.isfile(os.path.join(folder, f)) and f.lower().endswith(IMG_EXTS)
    )


def letterbox_rgb(
    img: np.ndarray,
    target_hw: Tuple[int, int] = TARGET_SIZE,
    pad_color: Tuple[int, int, int] = PADDING_COLOR_RGB,
) -> np.ndarray:
    """Aspect-preserving resize + center pad, uint8 RGB in/out."""
    import cv2

    target_h, target_w = target_hw
    h, w = img.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("Invalid image with zero dimension.")
    scale = min(target_w / w, target_h / h)
    new_w = max(1, int(round(w * scale)))
    new_h = max(1, int(round(h * scale)))
    resized = cv2.resize(img, (new_w, new_h), interpolation=cv2.INTER_AREA)
    canvas = np.full((target_h, target_w, 3), pad_color, dtype=np.uint8)
    x0 = (target_w - new_w) // 2
    y0 = (target_h - new_h) // 2
    canvas[y0 : y0 + new_h, x0 : x0 + new_w] = resized
    return canvas


def load_letterboxed_rgb(path: str, target_hw: Tuple[int, int] = TARGET_SIZE) -> np.ndarray:
    import cv2

    bgr = cv2.imread(path, cv2.IMREAD_COLOR)
    if bgr is None:
        raise RuntimeError(f"Cannot read image: {path}")
    return letterbox_rgb(cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB), target_hw)


def save_rgb(img: np.ndarray, path: str) -> None:
    from PIL import Image

    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(img).save(path)


def md5_int(s: str) -> int:
    return int(hashlib.md5(s.encode("utf-8")).hexdigest(), 16)


def stable_index(name: str, modulo: int) -> int:
    """md5-stable index, identical to the reference's curriculum keying
    (``generate_paired_degradation_dataset.py:234-238``)."""
    if modulo <= 0:
        return 0
    return md5_int(name) % modulo


def stable_rng(name: str, variant_id: int, seed: int) -> random.Random:
    return random.Random((md5_int(f"{name}__v{variant_id}") & 0xFFFFFFFF) ^ seed)


def stable_np_rng(name: str, variant_id: int, seed: int) -> np.random.Generator:
    return np.random.default_rng((md5_int(f"np::{name}__v{variant_id}") & 0xFFFFFFFF) ^ seed)


def load_or_create_split(
    names: List[str], split_path: str, ratios: Dict[str, float], seed: int
) -> Dict[str, List[str]]:
    """Persisted deterministic split; re-used if the file already exists."""
    if os.path.exists(split_path):
        with open(split_path, "r", encoding="utf-8") as f:
            return json.load(f)

    if abs(sum(ratios.values()) - 1.0) > 1e-6:
        raise ValueError(f"Split ratios must sum to 1.0: {ratios}")

    rnd = random.Random(seed)
    names = names[:]
    rnd.shuffle(names)

    split: Dict[str, List[str]] = {}
    start = 0
    items = list(ratios.items())
    for i, (split_name, ratio) in enumerate(items):
        if i == len(items) - 1:
            split[split_name] = names[start:]
        else:
            n = int(round(len(names) * ratio))
            split[split_name] = names[start : start + n]
            start += n

    os.makedirs(os.path.dirname(split_path), exist_ok=True)
    with open(split_path, "w", encoding="utf-8") as f:
        json.dump(split, f, indent=2)
    return split
