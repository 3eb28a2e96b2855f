#!/usr/bin/env python
"""Eval-path wall-clock: async PNG writer pool vs synchronous saving.

VERDICT r2 item 7 asked for the engine test path to overlap
decode/compute/PNG-write like the serving CLI, with a before/after
wall-clock.  `Model._save_batch_outputs` now queues frames on a writer
pool (engine/model.py); this measures `Model.test_step` end-to-end both
ways on a synthetic paired dataset (decode-free input so the write side is
the variable under test).

Usage: python benchmarks/eval_wallclock.py [--n 256] [--batch 32] [--hw 256 384]
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_model(tmp: str, n: int, batch: int, h: int, w: int):
    from multi_degradation_image_enhancement_tpu.data.loader import DeviceDataLoader
    from multi_degradation_image_enhancement_tpu.data.synthetic import (
        SyntheticPairedDataset,
    )
    from multi_degradation_image_enhancement_tpu.engine.model import Model
    from multi_degradation_image_enhancement_tpu.models.cdan import CDAN

    cfg = {
        "name": "eval_wallclock",
        "phase": "test",
        "loss": {"enabled": True, "terms": [{"name": "charbonnier", "weight": 1.0}]},
        "metrics": {"enabled": True, "items": [{"name": "psnr"}]},
        "evaluation": {"raw": True, "postprocessed": False},
        "post_processing": {"enabled": False, "ops": []},
        "save_outputs": {
            "enabled": True,
            "output_dir": os.path.join(tmp, "outputs") + "/",
            "save_raw": False,
            "save_postprocessed": True,
        },
        "logging": {"enabled": False},
        "train": {"n_epoch": 1, "lr": 1e-3},
        "test": {
            "device": "tpu",
            "dataloader": {"args": {"batch_size": batch}},
            "model_path": os.path.join(tmp, "w") + "/",
            "model_name": "m.pt",
            "dataset": {"is_paired": True},
        },
    }
    ds = SyntheticPairedDataset(
        degradation="noise",
        n_images=n,
        transform={"backend": "albumentations", "ops": [
            {"name": "Resize", "args": {"height": h, "width": w}},
            {"name": "Normalize", "args": {"mean": [0, 0, 0], "std": [1, 1, 1]}},
            {"name": "ToTensorV2", "args": {}},
        ]},
    )
    loader = DeviceDataLoader(ds, batch_size=batch, shuffle=False)
    model = Model(CDAN(), config=cfg, dataloader=loader)
    # Save untrained weights so _load_for_eval has a checkpoint to read.
    import jax
    import jax.numpy as jnp

    variables = model.network.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        jnp.zeros((1, h, w, 3), jnp.float32),
        train=False,
    )
    model.save_model(variables["params"], variables.get("batch_stats", {}))
    return model


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=256)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--hw", nargs=2, type=int, default=[256, 384])
    args = ap.parse_args()

    from multi_degradation_image_enhancement_tpu.engine import model as engine_model

    with tempfile.TemporaryDirectory() as tmp:
        m = build_model(tmp, args.n, args.batch, args.hw[0], args.hw[1])

        # Warm-up: compile eval step + first writer-pool spin-up.
        m.test_step()

        t0 = time.perf_counter()
        m.test_step()
        t_async = time.perf_counter() - t0

        # Synchronous variant: same path, futures drained after every batch
        # (serializes PNG encode against the next device batch).
        orig = engine_model.Model._save_batch_outputs

        def sync_save(self, outputs, start_index, prefix):
            orig(self, outputs, start_index, prefix)
            self._drain_writers()

        engine_model.Model._save_batch_outputs = sync_save
        try:
            t0 = time.perf_counter()
            m.test_step()
            t_sync = time.perf_counter() - t0
        finally:
            engine_model.Model._save_batch_outputs = orig

        n = args.n
        print(
            f"eval wall-clock over {n} imgs @ {args.hw[0]}x{args.hw[1]} b{args.batch}:\n"
            f"  async writer pool : {t_async:6.2f} s  ({n/t_async:6.1f} img/s)\n"
            f"  synchronous saves : {t_sync:6.2f} s  ({n/t_sync:6.1f} img/s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
