"""On-device synthetic classifier data: composed degradations in HBM per step.

The reference trains its classifier on a disk dataset materialized by
``generate_classifier_dataset.py`` (OpenCV loop → PNGs → DataLoader).  Here
the same sampling distribution — degradation count 1/2/3 w.p. 0.6/0.3/0.1,
co-occurrence bias, three pipeline-order templates, Beta-mixture severities,
10% clean samples, md5-stable per-(image, variant) streams
(``generate_classifier.py`` shares the same planning code) — is *planned*
on host, and the degradation chains execute batched on device via
``ops.severity``.

Batching trick: each batch holds samples of a single pipeline template, so
one batch needs at most the 9 ordered masked severity applications of that
template (instead of 27 for all templates).  Samples are shuffled within
template groups each epoch; the template mix across batches matches the
sampling distribution.
"""

from __future__ import annotations

import threading
from queue import Queue
from typing import Iterator, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from multi_degradation_image_enhancement_tpu.classification.model import (
    IMAGENET_MEAN,
    IMAGENET_STD,
)
from multi_degradation_image_enhancement_tpu.data.synthetic import _procedural_clean
from multi_degradation_image_enhancement_tpu.data.dataset import _list_images, _load_rgb
from multi_degradation_image_enhancement_tpu.datasets_generation.common import md5_int
from multi_degradation_image_enhancement_tpu.datasets_generation.generate_classifier import (
    PIPELINES,
    plan_variant,
)
from multi_degradation_image_enhancement_tpu.ops.degradations import DEGRADATIONS
from multi_degradation_image_enhancement_tpu.ops.severity import apply_severity


class SyntheticClassifierDataset:
    """Plans (labels, severities, template) per sample; images degrade on device."""

    def __init__(
        self,
        split: str = "train",
        clean_root: Optional[str] = None,
        n_images: int = 256,
        variants_per_image: int = 2,
        input_hw: Tuple[int, int] = (256, 384),
        seed: int = 42,
    ):
        self.classes = list(DEGRADATIONS)
        self.input_hw = input_hw
        self.seed = seed

        if clean_root:
            self.files = [f for f in _list_images(clean_root)]
            self.clean_root = clean_root
            self._clean = None
            names = self.files[:n_images] if n_images else self.files
            self.names = names
        else:
            self.clean_root = None
            split_seed = seed + {"train": 0, "val": 1000, "test": 2000}[split]
            self._clean = _procedural_clean(n_images, input_hw[0], input_hw[1], split_seed)
            self.names = [f"{split}_{i:05d}.png" for i in range(n_images)]

        # one plan per (image, variant), md5-stable like the offline generator
        self.samples: List[Tuple[int, int, dict, int]] = []
        for idx, name in enumerate(self.names):
            for v in range(variants_per_image):
                plan = plan_variant(name, v, seed)
                rng = np.random.RandomState(md5_int(f"tmpl::{name}::v{v}") % (2**31))
                template_id = int(rng.randint(0, len(PIPELINES)))
                self.samples.append((idx, v, plan, template_id))

    def __len__(self) -> int:
        return len(self.samples)

    def labels_rows(self) -> List[dict]:
        """Rows shaped like labels.jsonl, for pos_weight computation."""
        return [
            {"labels": {c: int(c in plan["chosen"]) for c in self.classes}}
            for (_, _, plan, _) in self.samples
        ]

    def clean_image(self, image_idx: int) -> np.ndarray:
        if self._clean is not None:
            return self._clean[image_idx]
        import os

        return _load_rgb(os.path.join(self.clean_root, self.names[image_idx]), self.input_hw)


class SyntheticClassifierLoader:
    """Yields (x, y, s, ids): device-degraded, augmented, normalized batches."""

    def __init__(
        self,
        dataset: SyntheticClassifierDataset,
        batch_size: int,
        shuffle: bool = False,
        augment: bool = False,
        normalize: bool = True,
        seed: int = 42,
    ):
        self.dataset = dataset
        self.batch_size = int(batch_size)
        self.shuffle = shuffle
        self.seed = seed
        self._epoch = 0

        classes = dataset.classes
        mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
        std = jnp.asarray(IMAGENET_STD, jnp.float32)

        from multi_degradation_image_enhancement_tpu.data.transforms import (
            _op_hflip,
            _op_rotation,
            _op_vflip,
        )

        hflip, vflip, rot = _op_hflip(0.5), _op_vflip(0.15), _op_rotation(5.0)

        def make_pipeline(template_id: int):
            order = PIPELINES[template_id]

            @jax.jit
            def pipeline(clean_u8, labels, severities, key):
                x = clean_u8.astype(jnp.float32)
                for d in order:
                    ci = classes.index(d)
                    kd = jax.random.fold_in(key, ci)
                    sev = severities[:, ci]
                    degraded, _ = apply_severity(d, x, sev, kd)
                    chosen = labels[:, ci] > 0.5
                    x = jnp.where(chosen[:, None, None, None], degraded, x)
                if augment:
                    k1, k2, k3 = jax.random.split(jax.random.fold_in(key, 999), 3)
                    x = hflip(x, k1)
                    x = vflip(x, k2)
                    x = rot(x, k3)
                x = x / 255.0
                if normalize:
                    x = (x - mean) / std
                return x

            return pipeline

        self._pipelines = {t: make_pipeline(t) for t in range(len(PIPELINES))}

    def __len__(self) -> int:
        return (len(self.dataset) + self.batch_size - 1) // self.batch_size

    def _batches(self) -> List[List[int]]:
        """Group sample indices by template, then batch within groups."""
        by_template: dict = {}
        for i, (_, _, _, t) in enumerate(self.dataset.samples):
            by_template.setdefault(t, []).append(i)
        rng = np.random.RandomState(self.seed + self._epoch)
        batches = []
        for t, idxs in sorted(by_template.items()):
            idxs = np.asarray(idxs)
            if self.shuffle:
                rng.shuffle(idxs)
            for i in range(0, len(idxs), self.batch_size):
                batches.append(list(idxs[i : i + self.batch_size]))
        if self.shuffle:
            rng.shuffle(batches)
        return batches

    def __iter__(self) -> Iterator:
        epoch_key = jax.random.fold_in(jax.random.key(self.seed), self._epoch)
        batches = self._batches()
        self._epoch += 1
        ds = self.dataset
        classes = ds.classes

        q: Queue = Queue(maxsize=2)

        def producer():
            for bi, idxs in enumerate(batches):
                imgs, ys, ss, ids = [], [], [], []
                template_id = ds.samples[idxs[0]][3]
                for i in idxs:
                    img_idx, v, plan, _t = ds.samples[i]
                    imgs.append(ds.clean_image(img_idx))
                    ys.append([float(c in plan["chosen"]) for c in classes])
                    ss.append([float(plan["severities"].get(c, 0.0)) for c in classes])
                    ids.append(f"{ds.names[img_idx]}::v{v}")
                q.put((bi, template_id, np.stack(imgs), np.asarray(ys, np.float32),
                       np.asarray(ss, np.float32), ids))
            q.put(None)

        threading.Thread(target=producer, daemon=True).start()
        while True:
            item = q.get()
            if item is None:
                break
            bi, template_id, imgs, ys, ss, ids = item
            key = jax.random.fold_in(epoch_key, bi)
            x = self._pipelines[template_id](
                jnp.asarray(imgs), jnp.asarray(ys), jnp.asarray(ss), key
            )
            yield x, jnp.asarray(ys), jnp.asarray(ss), ids
