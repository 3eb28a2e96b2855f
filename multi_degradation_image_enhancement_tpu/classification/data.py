"""Classifier dataset + device-feeding loader.

Parity: reference ``MultiLabelSeverityDataset`` reads
``<root>/<split>/labels.jsonl`` rows and yields (image, labels[C],
severity[C], rel_path) (``classification/train_multilabel_classifier.py:82-111``).
Augmentation (flip/rotation) and ImageNet normalization run batched on
device; paths stay host-side for diagnostics export.
"""

from __future__ import annotations

import json
import os
import threading
from concurrent.futures import ThreadPoolExecutor
from queue import Queue
from typing import Dict, Iterator, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from multi_degradation_image_enhancement_tpu.classification.model import (
    IMAGENET_MEAN,
    IMAGENET_STD,
)
from multi_degradation_image_enhancement_tpu.data.transforms import (
    _op_hflip,
    _op_rotation,
    _op_vflip,
)


def read_jsonl(path: str) -> List[dict]:
    rows = []
    with open(path, "r", encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if line:
                rows.append(json.loads(line))
    return rows


class MultiLabelSeverityDataset:
    def __init__(self, root: str, split: str, classes: List[str], input_hw=(256, 384)):
        self.root = root
        self.split = split
        self.classes = classes
        self.input_hw = input_hw
        self.rows = read_jsonl(os.path.join(root, split, "labels.jsonl"))

    def __len__(self) -> int:
        return len(self.rows)

    def load(self, idx: int) -> Tuple[np.ndarray, np.ndarray, np.ndarray, str]:
        r = self.rows[idx]
        rel = str(r["file"]).replace("\\", "/")
        img = Image.open(os.path.join(self.root, rel)).convert("RGB")
        if (img.height, img.width) != self.input_hw:
            img = img.resize((self.input_hw[1], self.input_hw[0]), Image.BILINEAR)
        y = np.array([r["labels"][c] for c in self.classes], np.float32)
        s = np.array([r["severity"][c] for c in self.classes], np.float32)
        return np.asarray(img, np.uint8), y, s, rel


class ClassifierLoader:
    """Batches (images, y, s) onto device; augs + normalization inside jit."""

    def __init__(
        self,
        dataset: MultiLabelSeverityDataset,
        batch_size: int,
        shuffle: bool = False,
        augment: bool = False,
        normalize: bool = True,
        num_workers: int = 0,
        seed: int = 42,
    ):
        self.dataset = dataset
        self.batch_size = int(batch_size)
        self.shuffle = shuffle
        self.augment = augment
        self.seed = seed
        self._epoch = 0
        self._pool = ThreadPoolExecutor(max_workers=max(1, num_workers or 1))

        mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
        std = jnp.asarray(IMAGENET_STD, jnp.float32)
        hflip = _op_hflip(0.5)
        vflip = _op_vflip(0.15)
        rot = _op_rotation(5.0)

        @jax.jit
        def pipeline(images_u8: jax.Array, key: jax.Array) -> jax.Array:
            x = images_u8.astype(jnp.float32)
            if augment:  # train transform (reference :765-772)
                k1, k2, k3 = jax.random.split(key, 3)
                x = hflip(x, k1)
                x = vflip(x, k2)
                x = rot(x, k3)
            x = x / 255.0
            if normalize:
                x = (x - mean) / std
            return x

        self._pipeline = pipeline

    def __len__(self) -> int:
        return (len(self.dataset) + self.batch_size - 1) // self.batch_size

    def __iter__(self) -> Iterator[Tuple[jax.Array, jax.Array, jax.Array, List[str]]]:
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            np.random.RandomState(self.seed + self._epoch).shuffle(order)
        epoch_key = jax.random.fold_in(jax.random.key(self.seed), self._epoch)
        self._epoch += 1

        batches = [order[i : i + self.batch_size] for i in range(0, n, self.batch_size)]
        q: Queue = Queue(maxsize=2)

        def producer():
            for bi, idxs in enumerate(batches):
                items = list(self._pool.map(self.dataset.load, idxs))
                imgs = np.stack([it[0] for it in items])
                ys = np.stack([it[1] for it in items])
                ss = np.stack([it[2] for it in items])
                paths = [it[3] for it in items]
                q.put((bi, imgs, ys, ss, paths))
            q.put(None)

        threading.Thread(target=producer, daemon=True).start()
        while True:
            item = q.get()
            if item is None:
                break
            bi, imgs, ys, ss, paths = item
            key = jax.random.fold_in(epoch_key, bi)
            x = self._pipeline(jnp.asarray(imgs), key)
            yield x, jnp.asarray(ys), jnp.asarray(ss), paths
