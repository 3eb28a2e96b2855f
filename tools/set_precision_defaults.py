#!/usr/bin/env python
"""Set each task config's training-precision default from measurement.

Reads the per-task ``precision_ab.json`` snapshots
(``tools/parity/results_r3``) — produced by ``tools/parity/precision_ab.py``,
which retrains the ours side with ``train.precision: fp32`` at the recorded
parity protocol — and pins ``train.precision`` in
``multi_degradation_image_enhancement_tpu/config/<task>{,_synthetic}.json``
to fp32 only where the measured fp32−bf16 PSNR delta clears the threshold.
Tasks without a measured win keep the engine default (bf16 on TPU), so the
speed cost of fp32 training is paid only where a quality win is proven.

Usage: python tools/set_precision_defaults.py [--results tools/parity/results_r3]
       [--threshold 0.3] [--dry-run]
"""

from __future__ import annotations

import argparse
import glob
import json
import os

from _cfgio import dump_commented_json, load_commented_json

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CFG_DIR = os.path.join(
    REPO, "multi_degradation_image_enhancement_tpu", "config"
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--results", default=os.path.join(REPO, "tools", "parity", "results_r3"))
    ap.add_argument("--threshold", type=float, default=0.3,
                    help="pin fp32 only if measured fp32−bf16 ΔPSNR ≥ this (dB)")
    ap.add_argument("--dry-run", action="store_true")
    args = ap.parse_args()

    measured = {}
    for path in sorted(glob.glob(os.path.join(args.results, "*_precision_ab.json"))):
        with open(path) as f:
            ab = json.load(f)
        if ab.get("delta_psnr_db") is not None:
            measured[ab["task"]] = ab["delta_psnr_db"]

    if not measured:
        print("no *_precision_ab.json with a delta found; nothing to do")
        return

    for task, delta in sorted(measured.items()):
        pin = delta >= args.threshold
        for suffix in ("", "_synthetic"):
            cfg_path = os.path.join(CFG_DIR, f"{task}{suffix}.json")
            if not os.path.isfile(cfg_path):
                print(f"  (no config {task}{suffix}.json)")
                continue
            cfg, comments = load_commented_json(cfg_path)
            train = cfg.setdefault("train", {})
            before = train.get("precision")
            if pin:
                # NOTE: no "//" comment key — load_config strips from "//" to
                # end-of-line even inside strings (reference parser parity).
                train["precision"] = "fp32"
                train["precision_measured_delta_psnr_db"] = round(delta, 3)
            else:
                train.pop("precision", None)
                train.pop("precision_measured_delta_psnr_db", None)
            after = train.get("precision")
            changed = before != after
            print(f"{task}{suffix}: fp32−bf16 Δ{delta:+.3f} dB → precision "
                  f"{'fp32' if pin else 'engine default'}"
                  f"{' (changed)' if changed else ''}")
            if changed and not args.dry_run:
                dump_commented_json(cfg_path, cfg, comments)


if __name__ == "__main__":
    main()
