#!/usr/bin/env python
"""Set each task config's BN-recalibration default from measurement.

Reads the per-task ``recal_ab.json`` snapshots (``tools/parity/results_r3``
by default, or a live parity root) and enables ``train.bn_recalibration``
in ``multi_degradation_image_enhancement_tpu/config/<task>{,_synthetic}.json``
only where the measured A/B shows a PSNR gain above the threshold —
closing VERDICT r2 item 3's "set each config's recal default from
measurement" (the round-2 defaults were extrapolated from 3 tasks).

Usage: python tools/set_recal_defaults.py [--results tools/parity/results_r3]
       [--threshold 0.1] [--dry-run]
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
    ap.add_argument("--threshold", type=float, default=0.1,
                    help="enable recal only if measured ΔPSNR ≥ this (dB)")
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--dry-run", action="store_true")
    args = ap.parse_args()

    measured = {}
    for path in sorted(glob.glob(os.path.join(args.results, "*_recal_ab.json"))):
        with open(path) as f:
            ab = json.load(f)
        measured[ab["task"]] = ab["recal_delta_psnr_db"]

    for task, delta in sorted(measured.items()):
        enable = delta >= args.threshold
        for suffix in ("", "_synthetic"):
            cfg_path = os.path.join(CFG_DIR, f"{task}{suffix}.json")
            if not os.path.isfile(cfg_path):
                print(f"  (no config {task}{suffix}.json)")
                continue
            cfg, comments = load_commented_json(cfg_path)
            train = cfg.setdefault("train", {})
            before = train.get("bn_recalibration")
            if enable:
                # NOTE: no "//" key — load_config strips text from "//" to
                # end-of-line even inside strings (reference parser parity),
                # which would corrupt the JSON.
                train["bn_recalibration"] = {
                    "passes": args.passes,
                    "measured_delta_psnr_db": round(delta, 3),
                }
            else:
                train.pop("bn_recalibration", None)
            after = train.get("bn_recalibration")
            changed = before != after
            print(f"{task}{suffix}: Δ{delta:+.3f} dB → recal "
                  f"{'ON' if enable else 'off'}{' (changed)' if changed else ''}")
            if changed and not args.dry_run:
                dump_commented_json(cfg_path, cfg, comments)


if __name__ == "__main__":
    main()
