"""Data layer: transforms, datasets, loader."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from multi_degradation_image_enhancement_tpu.data.dataset import (
    PairedDataset,
    UnpairedDataset,
)
from multi_degradation_image_enhancement_tpu.data.loader import DeviceDataLoader
from multi_degradation_image_enhancement_tpu.data.synthetic import SyntheticPairedDataset
from multi_degradation_image_enhancement_tpu.data.transforms import build_transforms

TRANSFORM_CFG = {
    "backend": "albumentations",
    "ops": [
        {"name": "HorizontalFlip", "args": {"p": 0.5}},
        {"name": "VerticalFlip", "args": {"p": 0.5}},
        {"name": "RandomRotate90", "args": {"p": 0.5}},
        {"name": "Resize", "args": {"height": 16, "width": 24}},
        {"name": "Normalize", "args": {"mean": [0, 0, 0], "std": [1, 1, 1]}},
        {"name": "ToTensorV2", "args": {}},
    ],
}


def test_paired_transform_consistency():
    """Random augs must hit input and target identically (fixes the
    reference's torchvision divergence, transforms_factory.py:118)."""
    _, tf = build_transforms(TRANSFORM_CFG, is_paired=True)
    rng = np.random.RandomState(0)
    inp = jnp.asarray(rng.randint(0, 256, (4, 16, 24, 3)), jnp.float32)
    key = jax.random.key(3)
    a, b = tf.apply_paired(inp, inp, key)
    assert np.allclose(np.asarray(a), np.asarray(b))
    # and the augmentation actually does something across keys
    c, _ = tf.apply_paired(inp, inp, jax.random.key(4))
    assert not np.allclose(np.asarray(a), np.asarray(c))


def test_normalize_semantics():
    cfg = {"backend": "albumentations", "ops": [
        {"name": "Normalize", "args": {"mean": [0, 0, 0], "std": [1, 1, 1]}},
    ]}
    _, tf = build_transforms(cfg, is_paired=False)
    x = jnp.full((1, 4, 4, 3), 255.0)
    out = tf(x, jax.random.key(0))
    assert np.allclose(np.asarray(out), 1.0)


def test_unknown_transform_raises():
    with pytest.raises(ValueError):
        build_transforms(
            {"backend": "albumentations", "ops": [{"name": "ZorpWarp", "args": {}}]},
            is_paired=True,
        )


def _write_pngs(root, names, size=(24, 16)):
    os.makedirs(root, exist_ok=True)
    rng = np.random.RandomState(0)
    for n in names:
        Image.fromarray(
            rng.randint(0, 255, (size[1], size[0], 3), dtype=np.uint8)
        ).save(os.path.join(root, n))


def test_paired_dataset_pairing_modes(tmp_path):
    inp, tgt = str(tmp_path / "deg"), str(tmp_path / "clean")
    _write_pngs(inp, ["a.png", "b.png", "c.png"])
    _write_pngs(tgt, ["a.png", "b.png", "d.png"])
    ds = PairedDataset(inp, tgt, pairing_mode="filename")
    assert len(ds) == 2  # intersection only

    _write_pngs(str(tmp_path / "deg2"), ["a.jpg"])
    _write_pngs(str(tmp_path / "clean2"), ["a.png"])
    ds2 = PairedDataset(str(tmp_path / "deg2"), str(tmp_path / "clean2"), pairing_mode="stem")
    assert len(ds2) == 1

    _write_pngs(str(tmp_path / "clean3"), ["z.png"])  # no filename overlap with inp
    with pytest.raises(RuntimeError):
        PairedDataset(inp, str(tmp_path / "clean3"), pairing_mode="filename")
    with pytest.raises(ValueError):
        PairedDataset(inp, tgt, pairing_mode="bogus")


def test_loader_over_paired_dirs(tmp_path):
    inp, tgt = str(tmp_path / "deg"), str(tmp_path / "clean")
    names = [f"{i}.png" for i in range(5)]
    _write_pngs(inp, names)
    _write_pngs(tgt, names)
    ds = PairedDataset(inp, tgt, transform=TRANSFORM_CFG)
    loader = DeviceDataLoader(ds, batch_size=2, shuffle=True, seed=7)
    assert len(loader) == 3  # ceil(5/2), partial last batch kept (padded)
    batches = list(loader)
    # every batch is padded to full size; the mask marks the valid rows
    assert [b[0].shape[0] for b in batches] == [2, 2, 2]
    assert [int(b[2].sum()) for b in batches] == [2, 2, 1]
    assert list(np.asarray(batches[2][2])) == [1.0, 0.0]
    assert batches[0][0].shape[1:] == (16, 24, 3)


def test_loader_synthetic_on_device_degrade():
    ds = SyntheticPairedDataset(
        degradation="low_light", n_images=4, transform=TRANSFORM_CFG
    )
    loader = DeviceDataLoader(ds, batch_size=2, shuffle=False)
    (deg, clean, mask) = next(iter(loader))
    assert deg.shape == clean.shape == (2, 16, 24, 3)
    assert mask.shape == (2,) and float(mask.sum()) == 2.0
    # low_light multiplies by ≤0.4, so degraded must be darker than clean
    assert float(deg.mean()) < float(clean.mean()) * 0.6


def test_unpaired_dataset_and_loader(tmp_path):
    root = str(tmp_path / "u")
    _write_pngs(root, ["a.png", "b.png", "c.png"])
    ds = UnpairedDataset(root, transform=TRANSFORM_CFG)
    loader = DeviceDataLoader(ds, batch_size=2)
    batches = list(loader)
    assert batches[0][0].shape == (2, 16, 24, 3)
    assert batches[1][0].shape == (2, 16, 24, 3)  # padded to full size
    assert [int(b[1].sum()) for b in batches] == [2, 1]


def test_epoch_shuffling_is_deterministic_but_varies(tmp_path):
    ds = SyntheticPairedDataset(degradation="noise", n_images=6, transform=TRANSFORM_CFG)
    l1 = DeviceDataLoader(ds, batch_size=6, shuffle=True, seed=5)
    l2 = DeviceDataLoader(ds, batch_size=6, shuffle=True, seed=5)
    a1 = np.asarray(next(iter(l1))[1])
    a2 = np.asarray(next(iter(l2))[1])
    assert np.allclose(a1, a2)  # same seed+epoch → same order & augs
    b1 = np.asarray(next(iter(l1))[1])  # epoch 2
    assert not np.allclose(a1, b1)


def test_loader_single_shape_per_epoch(tmp_path):
    """Every yielded batch has the full batch shape — a jitted consumer
    compiles exactly once per dataset (VERDICT r2 item 8)."""
    ds = SyntheticPairedDataset(degradation="noise", n_images=5, transform=TRANSFORM_CFG)
    loader = DeviceDataLoader(ds, batch_size=2, shuffle=False)
    shapes = {tuple(b[0].shape) for b in loader}
    assert len(shapes) == 1
    masks = [tuple(np.asarray(b[2])) for b in loader]
    assert masks == [(1.0, 1.0), (1.0, 1.0), (1.0, 0.0)]


def test_loader_decode_failure_propagates(tmp_path):
    """A decode error in the prefetch thread must raise in the consumer
    (not hang the iterator) — same contract as data/streaming.py.

    (The native decoder zero-fills unreadable files by documented design,
    so the raise path is exercised by failing the host-batch step itself.)"""
    inp, tgt = str(tmp_path / "deg"), str(tmp_path / "clean")
    names = [f"{i}.png" for i in range(4)]
    _write_pngs(inp, names)
    _write_pngs(tgt, names)
    ds = PairedDataset(inp, tgt, transform=TRANSFORM_CFG)
    loader = DeviceDataLoader(ds, batch_size=2, shuffle=False)

    calls = {"n": 0}
    orig = loader._host_batch

    def failing(idxs):
        calls["n"] += 1
        if calls["n"] == 2:
            raise OSError("simulated mid-epoch decode failure")
        return orig(idxs)

    loader._host_batch = failing
    with pytest.raises(OSError, match="simulated mid-epoch"):
        list(loader)
