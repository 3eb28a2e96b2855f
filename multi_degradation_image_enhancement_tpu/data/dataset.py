"""Directory-backed paired / unpaired datasets.

Capability parity with the reference datasets (``data/dataset.py:29-112`` in
/root/reference): ``input_root`` (degraded) + ``target_root`` (clean) with
pairing modes ``filename`` / ``stem`` / ``sorted``; an empty pairing raises;
images load as RGB.  The transform config builds a batched *device*
transform (see ``data.transforms``) instead of per-image CPU albumentations.

These host-side datasets return uint8 NumPy arrays; batching, H2D transfer,
device transforms, and (optionally) on-device degradation live in
``data.loader``.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Tuple

import numpy as np
from PIL import Image

from multi_degradation_image_enhancement_tpu.data.transforms import build_transforms

_IMG_EXTS = (".png", ".jpg", ".jpeg", ".bmp", ".tif", ".tiff", ".webp")


def _list_images(folder: str) -> List[str]:
    return sorted(
        f
        for f in os.listdir(folder)
        if not f.startswith(".") and f.lower().endswith(_IMG_EXTS)
    )


def _stem(filename: str) -> str:
    return os.path.splitext(filename)[0]


# Pairing keys per mode: how a file in one root is matched to the other root.
_PAIR_KEYS = {
    "filename": lambda f: f,
    "stem": _stem,
}


def _match_pairs(input_root: str, target_root: str, mode: str):
    """Resolve (degraded_path, clean_path) pairs between two directories.

    Modes (same contract as reference ``data/dataset.py:52-77``):
    ``filename`` matches identical names, ``stem`` ignores the extension,
    ``sorted`` zips the two sorted listings positionally (legacy; truncates
    to the shorter side).
    """
    inp_files = _list_images(input_root)
    tgt_files = _list_images(target_root)

    if mode == "sorted":
        return [
            (os.path.join(input_root, a), os.path.join(target_root, b))
            for a, b in zip(inp_files, tgt_files)
        ]

    key = _PAIR_KEYS.get(mode)
    if key is None:
        raise ValueError(f"Unknown pairing_mode: {mode}")
    by_key_inp = {key(f): f for f in inp_files}
    by_key_tgt = {key(f): f for f in tgt_files}
    pairs = [
        (
            os.path.join(input_root, by_key_inp[k]),
            os.path.join(target_root, by_key_tgt[k]),
        )
        for k in sorted(by_key_inp.keys() & by_key_tgt.keys())
    ]
    if not pairs:
        raise RuntimeError(
            f"Pairing produced zero matches (mode={mode!r}) between "
            f"{input_root!r} ({len(inp_files)} images) and "
            f"{target_root!r} ({len(tgt_files)} images)."
        )
    return pairs


def _load_rgb(path: str, target_hw: Optional[Tuple[int, int]]) -> np.ndarray:
    """Decode to uint8 RGB [H,W,3]; resize on host only if sizes are ragged.

    Uses the native C++ decoder (``data.io_native`` → native/mdie_io.cpp)
    when available, PIL otherwise.  The device transform chain re-runs its
    configured Resize, so this host resize only serves to make
    raggedly-sized inputs batchable; standard generator outputs are already
    at target size and skip it.
    """
    if target_hw is not None:
        from multi_degradation_image_enhancement_tpu.data import io_native

        native = io_native.decode_image(path, target_hw[0], target_hw[1])
        if native is not None:
            return native
    img = Image.open(path).convert("RGB")
    if target_hw is not None and (img.height, img.width) != target_hw:
        img = img.resize((target_hw[1], target_hw[0]), Image.BILINEAR)
    return np.asarray(img, dtype=np.uint8)


class PairedDataset:
    """Degraded/clean pairs from two directories (reference ``data/dataset.py:29-92``)."""

    paired = True
    device_degrade: Optional[str] = None

    def __init__(
        self,
        input_root: str,
        target_root: str,
        pairing_mode: str = "filename",
        transform: Optional[Dict] = None,
        image_size: Optional[List[int]] = None,  # backward-compat, unused
    ):
        self.input_root = input_root
        self.target_root = target_root
        self.pairs = _match_pairs(input_root, target_root, pairing_mode)
        self.backend, self.transform = build_transforms(transform, is_paired=True)

    def __len__(self) -> int:
        return len(self.pairs)

    def load_pair(self, idx: int) -> Tuple[np.ndarray, np.ndarray]:
        inp_path, tgt_path = self.pairs[idx]
        hw = self.transform.target_hw
        return _load_rgb(inp_path, hw), _load_rgb(tgt_path, hw)


class UnpairedDataset:
    """Inputs only (reference ``data/dataset.py:95-112``)."""

    paired = False
    device_degrade: Optional[str] = None

    def __init__(self, input_root: str, transform: Optional[Dict] = None):
        self.input_root = input_root
        self.files = [os.path.join(input_root, f) for f in _list_images(input_root)]
        self.backend, self.transform = build_transforms(transform, is_paired=False)

    def __len__(self) -> int:
        return len(self.files)

    def load_single(self, idx: int) -> np.ndarray:
        return _load_rgb(self.files[idx], self.transform.target_hw)
