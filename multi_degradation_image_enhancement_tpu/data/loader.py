"""Device-feeding data loader: host decode → batch → H2D → jitted transform.

Replaces the reference's ``torch.utils.data.DataLoader`` with forked worker
processes (``utils/parser.py:98-104`` in /root/reference).  Here the only
host work is image decode + stacking (threaded, overlapped with device
compute); random augmentation, normalization, and — for synthetic datasets —
the degradation itself run batched on device inside one jitted function, so
a training step consumes (degraded, clean) pairs straight from HBM.

Epoch shuffling is deterministic from a seed (reference seeds globally with
42, ``utils/reproducibility.py:6``).
"""

from __future__ import annotations

import threading
from concurrent.futures import ThreadPoolExecutor
from queue import Queue
from typing import Any, Dict, Iterator

import jax
import jax.numpy as jnp
import numpy as np

from multi_degradation_image_enhancement_tpu.ops.degradations import apply_degradation


class DeviceDataLoader:
    """Iterates device-resident batches.

    Yields ``(inputs, targets, mask)`` for paired datasets (arrays are
    [B,H,W,3] float32 in the transform's output domain) or ``(inputs, mask)``
    for unpaired ones.  Every sample is kept (torch ``drop_last=False``
    semantics) but a final partial batch is padded to full ``batch_size`` by
    repeating its last sample, so train/eval jit exactly once per dataset:
    ``mask`` is a per-sample validity vector [B] of {0.,1.} that consumers
    pass to the loss/metric pipelines (mask-weighted means) and use to slice
    saved outputs.
    """

    def __init__(
        self,
        dataset: Any,
        batch_size: int,
        shuffle: bool = False,
        num_workers: int = 0,
        seed: int = 42,
    ):
        self.dataset = dataset
        self.batch_size = int(batch_size)
        self.shuffle = bool(shuffle)
        self.seed = int(seed)
        self._epoch = 0
        self._pool = ThreadPoolExecutor(max_workers=max(1, int(num_workers) or 1))

        degrade_name = getattr(dataset, "device_degrade", None)
        transform = dataset.transform
        paired = getattr(dataset, "paired", True)

        # All host→device tensors travel channel-second ([..,3,H,W] u8): a
        # u8 NHWC buffer tile-pads its 3-channel minor dim 128/3 ≈ 42× in
        # HBM (the round-1 OOM at batch 512 — PERF.md), while [..,3,H,W]
        # pads nothing.  The NHWC layout the compute wants is restored by an
        # in-jit transpose that XLA fuses with the f32 cast.
        def _to_nhwc(chw_u8: jax.Array) -> jax.Array:
            return chw_u8.transpose(0, 2, 3, 1).astype(jnp.float32)

        if degrade_name is not None:

            @jax.jit
            def pipeline(clean_u8_chw: jax.Array, key: jax.Array):
                clean = _to_nhwc(clean_u8_chw)
                k_deg, k_aug = jax.random.split(key)
                degraded = apply_degradation(degrade_name, clean, k_deg)
                return transform.apply_paired(degraded, clean, k_aug)

        elif paired:

            @jax.jit
            def pipeline(stacked_u8_chw: jax.Array, key: jax.Array):
                inp = _to_nhwc(stacked_u8_chw[0])
                tgt = _to_nhwc(stacked_u8_chw[1])
                return transform.apply_paired(inp, tgt, key)

        else:

            @jax.jit
            def pipeline(inp_u8_chw: jax.Array, key: jax.Array):
                return transform(_to_nhwc(inp_u8_chw), key)

        self._pipeline = pipeline
        self._mode = "degrade" if degrade_name is not None else ("paired" if paired else "single")

        # Procedural/synthetic clean sets are small (≤ a few hundred MB u8):
        # cache them in HBM once so training batches are a device gather —
        # no host decode, no H2D per step (the 1-core host otherwise caps
        # training throughput).
        self._clean_dev = None
        if self._mode == "degrade" and getattr(dataset, "_clean", None) is not None:
            # [N,3,H,W] u8: unpadded in HBM (NHWC u8 would cost 42× — above).
            self._clean_dev = jnp.asarray(
                np.ascontiguousarray(np.transpose(dataset._clean, (0, 3, 1, 2)))
            )

    def __len__(self) -> int:
        n = len(self.dataset)
        return (n + self.batch_size - 1) // self.batch_size

    def _host_batch(self, indices: np.ndarray) -> np.ndarray:
        # Fast path: decode the whole batch through the native C++ engine
        # (one call, threaded, straight into the batch buffer).
        hw = getattr(self.dataset.transform, "target_hw", None)
        if hw is not None:
            from multi_degradation_image_enhancement_tpu.data import io_native

            if io_native.available():
                if self._mode == "paired":
                    pairs = [self.dataset.pairs[i] for i in indices]
                    paths = [p[0] for p in pairs] + [p[1] for p in pairs]
                    flat = io_native.decode_batch(
                        paths, hw[0], hw[1], n_threads=self._pool._max_workers
                    )
                    if flat is not None:
                        b = len(pairs)
                        return np.stack([flat[:b], flat[b:]])  # [2,B,H,W,3]
                elif (
                    self._mode in ("single", "degrade")
                    and getattr(self.dataset, "files", None) is not None
                ):
                    paths = [self.dataset.files[i] for i in indices]
                    flat = io_native.decode_batch(
                        paths, hw[0], hw[1], n_threads=self._pool._max_workers
                    )
                    if flat is not None:
                        return flat

        if self._mode == "paired":
            pairs = list(self._pool.map(self.dataset.load_pair, indices))
            inp = np.stack([p[0] for p in pairs])
            tgt = np.stack([p[1] for p in pairs])
            return np.stack([inp, tgt])  # [2,B,H,W,3] u8
        singles = list(self._pool.map(self.dataset.load_single, indices))
        return np.stack(singles)

    def __iter__(self) -> Iterator:
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self._epoch)
            rng.shuffle(order)
        epoch_key = jax.random.fold_in(jax.random.key(self.seed), self._epoch)
        self._epoch += 1

        # Pad the final partial batch to full size by repeating its last
        # sample: one compiled shape per dataset (no second jit at the odd
        # tail shape), with a validity mask excluding the repeats from every
        # loss/metric (mask-weighted means preserve the reference's
        # partial-batch mean semantics exactly — equal-size samples).
        bsz = self.batch_size
        batches = []
        for i in range(0, n, bsz):
            idxs = order[i : i + bsz]
            n_valid = len(idxs)
            if n_valid < bsz:
                idxs = np.concatenate([idxs, np.full(bsz - n_valid, idxs[-1])])
            batches.append((idxs, n_valid))

        def _mask(n_valid: int) -> jnp.ndarray:
            return jnp.asarray(
                (np.arange(bsz) < n_valid).astype(np.float32)
            )

        def _with_mask(out, n_valid):
            m = _mask(n_valid)
            if isinstance(out, tuple):
                return (*out, m)
            return (out, m)

        if self._clean_dev is not None:  # fully device-resident path
            for bi, (idxs, n_valid) in enumerate(batches):
                key = jax.random.fold_in(epoch_key, bi)
                x = jnp.take(self._clean_dev, jnp.asarray(idxs), axis=0)
                yield _with_mask(self._pipeline(x, key), n_valid)
            return

        # One-deep host prefetch: decode batch i+1 while the device consumes i.
        q: Queue = Queue(maxsize=2)

        def producer():
            # Decode failures must reach the consumer: without the sentinel
            # in a finally, an exception here would leave the consumer
            # blocked on q.get() forever (same contract as
            # data/streaming.py's producer).
            try:
                for bi, (idxs, n_valid) in enumerate(batches):
                    host = self._host_batch(idxs)
                    # channel-second for the H2D copy (overlapped with device
                    # compute by this prefetch thread); see pipeline note above.
                    host = np.ascontiguousarray(
                        np.moveaxis(host, -1, -3)
                    )
                    q.put((bi, host, n_valid))
                q.put(None)
            except BaseException as e:  # noqa: BLE001 — re-raised in consumer
                q.put(e)

        t = threading.Thread(target=producer, daemon=True)
        t.start()

        while True:
            item = q.get()
            if item is None:
                break
            if isinstance(item, BaseException):
                raise item
            bi, host, n_valid = item
            key = jax.random.fold_in(epoch_key, bi)
            yield _with_mask(self._pipeline(jnp.asarray(host), key), n_valid)


def define_dataloader(dataset: Any, dataloader_config: Dict[str, Any]) -> DeviceDataLoader:
    """Signature parity with reference ``utils/parser.py:98-104``."""
    return DeviceDataLoader(
        dataset,
        batch_size=dataloader_config["batch_size"],
        shuffle=bool(dataloader_config.get("shuffle", False)),
        num_workers=int(dataloader_config.get("num_workers", 0) or 0),
        seed=int(dataloader_config.get("seed", 42) or 42),
    )
