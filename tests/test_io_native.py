"""Native C++ IO engine (libjpeg/libpng decode + resize/letterbox batch API)."""

import numpy as np
import pytest
from PIL import Image

from multi_degradation_image_enhancement_tpu.data import io_native

pytestmark = pytest.mark.skipif(
    not io_native.available(), reason="native IO lib unavailable"
)


@pytest.fixture(scope="module")
def images(tmp_path_factory):
    root = tmp_path_factory.mktemp("imgs")
    rng = np.random.RandomState(0)
    paths = []
    arrays = []
    for i in range(4):
        arr = rng.randint(0, 255, (40, 56, 3), dtype=np.uint8)
        p = root / f"img_{i}.png"
        Image.fromarray(arr).save(p)
        paths.append(str(p))
        arrays.append(arr)
    jp = root / "img_j.jpg"
    Image.fromarray(arrays[0]).save(jp, quality=95)
    return paths, arrays, str(jp)


def test_png_decode_bit_exact(images):
    paths, arrays, _ = images
    out = io_native.decode_image(paths[0], 40, 56)
    np.testing.assert_array_equal(out, arrays[0])


def test_jpeg_decode_matches_pil(images):
    _, _, jp = images
    out = io_native.decode_image(jp, 40, 56)
    ref = np.asarray(Image.open(jp).convert("RGB"))
    assert np.abs(out.astype(int) - ref.astype(int)).max() <= 1


def test_resize_and_letterbox(images):
    paths, arrays, _ = images
    r = io_native.decode_image(paths[0], 20, 28, mode=io_native.MODE_RESIZE)
    assert r.shape == (20, 28, 3)
    # letterbox a wide target: pad rows appear top/bottom in gray 128
    lb = io_native.decode_image(paths[0], 60, 56, mode=io_native.MODE_LETTERBOX)
    assert lb.shape == (60, 56, 3)
    assert (lb[0] == 128).all() and (lb[-1] == 128).all()
    # exact-size mode rejects mismatched sizes
    assert io_native.decode_image(paths[0], 10, 10, mode=io_native.MODE_EXACT) is None


def test_batch_decode_and_failures(images):
    paths, arrays, _ = images
    batch = io_native.decode_batch(paths + ["/nonexistent.png"], 40, 56, n_threads=2)
    assert batch.shape == (5, 40, 56, 3)
    np.testing.assert_array_equal(batch[0], arrays[0])
    assert not batch[4].any()  # failed slot zero-filled


def test_encode_png_roundtrip(tmp_path):
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(40, 56, 3), dtype=np.uint8)
    p = str(tmp_path / "enc.png")
    assert io_native.encode_png(p, img, compress_level=6)
    back = np.asarray(Image.open(p).convert("RGB"))
    np.testing.assert_array_equal(back, img)  # lossless at any level
    # level 1 (the serving writer default) is equally lossless
    p1 = str(tmp_path / "enc1.png")
    assert io_native.encode_png(p1, img, compress_level=1)
    np.testing.assert_array_equal(np.asarray(Image.open(p1).convert("RGB")), img)


def test_encode_png_batch(tmp_path):
    rng = np.random.default_rng(4)
    batch = rng.integers(0, 256, size=(5, 24, 32, 3), dtype=np.uint8)
    paths = [str(tmp_path / f"b{i}.png") for i in range(5)]
    fails = io_native.encode_png_batch(paths, batch, compress_level=1, n_threads=3)
    assert fails == 0
    for i, p in enumerate(paths):
        np.testing.assert_array_equal(np.asarray(Image.open(p).convert("RGB")), batch[i])
    # unwritable path counts as a failure, others still land
    bad = ["/nonexistent_dir/x.png"] + paths[1:]
    assert io_native.encode_png_batch(bad, batch, n_threads=2) == 1


def test_encode_png_rejects_bad_shapes(tmp_path):
    assert not io_native.encode_png(str(tmp_path / "x.png"), np.zeros((4, 4, 4), np.uint8))
