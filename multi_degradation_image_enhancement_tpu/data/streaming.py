"""Streaming serving IO: decode-ahead producer + async PNG writer pool.

The serving CLI (``run_pipeline.py``) restores whole directories; the
reference's analogue is the per-image PIL loop in its test path
(``/root/reference/models/model.py:338-363``), which serializes decode →
forward → encode.  Here the three stages overlap:

* a producer thread decodes batch i+1 through the native C++ decoder
  (``native/mdie_io.cpp``, its own pthread pool; PIL fallback) while batch i
  is on the device;
* restored images are handed to a writer pool so PNG encoding never blocks
  the next device batch;
* a one-deep bounded queue keeps host memory flat.

``stream_restore`` is compute-agnostic: it takes any
``run_batch(u8_batch) -> per-image results`` callable, so tests can drive it
without a model and the CLI passes the jitted classify→route→restore step.
"""

from __future__ import annotations

import os
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, List, Optional, Sequence, Tuple

import numpy as np


def decode_chunk(
    paths: Sequence[str], hw: Tuple[int, int], io_threads: int = 4
) -> np.ndarray:
    """Decode files to one [N, H, W, 3] u8 batch (native fast path, PIL fallback)."""
    from multi_degradation_image_enhancement_tpu.data import io_native
    from multi_degradation_image_enhancement_tpu.data.dataset import _load_rgb

    if io_native.available():
        batch = io_native.decode_batch(list(paths), hw[0], hw[1], n_threads=io_threads)
        if batch is not None:
            return batch
    return np.stack([_load_rgb(p, hw) for p in paths])


def stream_restore(
    files: Sequence[str],
    images_dir: str,
    out_dir: str,
    *,
    hw: Tuple[int, int],
    batch: int,
    run_batch: Callable[[np.ndarray], Tuple[np.ndarray, Optional[np.ndarray]]],
    io_threads: int = 4,
    progress: Optional[Callable[[int, int], None]] = None,
) -> List[Tuple[str, Optional[np.ndarray]]]:
    """Run ``run_batch`` over a directory with overlapped decode and write.

    ``run_batch(u8 [N,H,W,3]) -> (restored u8 [N,H,W,3], aux or None)``;
    restored frames are written as ``<stem>.png`` under ``out_dir`` by the
    writer pool.  Returns ``[(filename, aux_row), ...]`` in input order
    (``aux_row`` is ``aux[j]`` when provided, e.g. router probabilities).
    Raises the first writer failure after the loop drains.
    """
    from PIL import Image

    from multi_degradation_image_enhancement_tpu.data import io_native

    os.makedirs(out_dir, exist_ok=True)
    feed: "queue.Queue" = queue.Queue(maxsize=2)

    def producer() -> None:
        # A decode failure (corrupt/unreadable file) must reach the consumer:
        # without the sentinel-in-finally the consumer would block on
        # ``feed.get()`` forever and the serving CLI would hang instead of
        # failing with the original error.
        error: Optional[BaseException] = None
        try:
            for i in range(0, len(files), batch):
                chunk = files[i : i + batch]
                paths = [os.path.join(images_dir, f) for f in chunk]
                feed.put((chunk, decode_chunk(paths, hw, io_threads)))
        except BaseException as exc:  # re-raised in the consumer loop
            error = exc
        finally:
            feed.put(error)

    threading.Thread(target=producer, daemon=True).start()

    def save_png(img_u8: np.ndarray, path: str) -> None:
        # libpng engine (native/mdie_io.cpp) when available — measured
        # ~1.6× PIL at compress level 1 with comparable file size; exact
        # same pixels either way (lossless).
        if not io_native.encode_png(path, img_u8):
            Image.fromarray(img_u8).save(path)

    results: List[Tuple[str, Optional[np.ndarray]]] = []
    done = 0
    with ThreadPoolExecutor(max_workers=io_threads) as writers:
        pending = []
        while True:
            item = feed.get()
            if item is None:
                break
            if isinstance(item, BaseException):
                raise item
            chunk, imgs = item
            restored, aux = run_batch(imgs)
            for j, fname in enumerate(chunk):
                stem = os.path.splitext(fname)[0]
                pending.append(
                    writers.submit(
                        save_png, restored[j], os.path.join(out_dir, f"{stem}.png")
                    )
                )
                results.append((fname, aux[j] if aux is not None else None))
            done += len(chunk)
            if progress is not None:
                progress(done, len(files))
        for fut in pending:
            fut.result()
    return results
