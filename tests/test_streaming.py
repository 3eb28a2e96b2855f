"""Streaming serving IO (data/streaming.py): decode-ahead + async writes.

Covers the machinery run_pipeline.py drives in production: producer-thread
decode, ordered aux rows, writer-pool PNG output, and writer-failure
propagation.  Compute is a stub — the router's own semantics are covered in
test_pipeline.py.
"""

import os

import numpy as np
import pytest
from PIL import Image

from multi_degradation_image_enhancement_tpu.data.streaming import (
    decode_chunk,
    stream_restore,
)

HW = (16, 24)


@pytest.fixture()
def image_dir(tmp_path):
    d = tmp_path / "degraded"
    d.mkdir()
    rng = np.random.RandomState(0)
    for i in range(7):  # odd count: exercises the ragged final batch
        arr = rng.randint(0, 255, (HW[0], HW[1], 3), np.uint8)
        Image.fromarray(arr).save(d / f"img_{i:02d}.png")
    return str(d)


def test_decode_chunk_shapes_and_values(image_dir):
    files = sorted(os.listdir(image_dir))
    batch = decode_chunk([os.path.join(image_dir, f) for f in files[:3]], HW)
    assert batch.shape == (3, HW[0], HW[1], 3) and batch.dtype == np.uint8
    ref = np.asarray(Image.open(os.path.join(image_dir, files[0])))
    np.testing.assert_array_equal(batch[0], ref)


def test_stream_restore_roundtrip(image_dir, tmp_path):
    out = str(tmp_path / "restored")
    files = sorted(os.listdir(image_dir))
    seen_batches = []

    def run_batch(imgs):
        seen_batches.append(imgs.shape[0])
        # "restore" = invert; aux = per-image mean so ordering is checkable
        return 255 - imgs, imgs.reshape(imgs.shape[0], -1).mean(axis=1)

    rows = stream_restore(
        files, image_dir, out, hw=HW, batch=3, run_batch=run_batch, io_threads=2
    )

    assert seen_batches == [3, 3, 1]
    assert [f for f, _ in rows] == files  # input order preserved
    for fname, aux in rows:
        src = np.asarray(Image.open(os.path.join(image_dir, fname)))
        assert aux == pytest.approx(src.reshape(-1).mean())
        restored = np.asarray(Image.open(os.path.join(out, fname)))
        np.testing.assert_array_equal(restored, 255 - src)


def test_stream_restore_propagates_write_failure(image_dir, tmp_path):
    out = str(tmp_path / "restored_bad")

    def run_batch(imgs):
        # 0-d per-image payload: PIL cannot encode it, so every writer fails
        return imgs[:, 0, 0, 0], None

    with pytest.raises(Exception):
        stream_restore(
            sorted(os.listdir(image_dir)), image_dir, out,
            hw=HW, batch=4, run_batch=run_batch, io_threads=2,
        )


def test_stream_restore_propagates_decode_failure(image_dir, tmp_path, monkeypatch):
    """A corrupt file must fail the run with the decode error, not hang the
    consumer on an empty queue (the producer enqueues the exception).

    Forces the PIL fallback (the raising path) — the native decoder instead
    zeros unreadable files by documented contract.
    """
    from multi_degradation_image_enhancement_tpu.data import io_native

    monkeypatch.setattr(io_native, "available", lambda: False)
    bad = os.path.join(image_dir, "img_03.png")
    with open(bad, "wb") as f:
        f.write(b"not a png at all")

    def run_batch(imgs):
        return imgs, None

    with pytest.raises(Exception):
        stream_restore(
            sorted(os.listdir(image_dir)), image_dir, str(tmp_path / "o"),
            hw=HW, batch=2, run_batch=run_batch, io_threads=2,
        )
