#!/usr/bin/env python
"""Set ``train.fused_dense`` in the task configs from the quality A/B.

The fused trainable DenseBlock kernels are a measured 1.34× end-to-end
training speedup at the reference recipe shape (b16 256×384 — PERF.md
round 3f), but their bf16 growth backward carries a 3.8e-3 relative
gradient deviation vs autodiff, so the default stays off until a
recipe-scale quality A/B (same data + seed, fused off vs on) shows the
trained result is within trajectory noise.  That A/B is
``tools/parity/results_r3/fused_dense_quality_ab.json`` (30-epoch noise
recipe; written by tools/r4_session1_queue.sh stage W).

This flips ``train.fused_dense: true`` in all 22 shipped configs iff the
A/B's fused-on PSNR is within ``--tolerance`` dB of fused-off (default
0.15 — half the reduced-scale per-seed spread floor of ~0.3 dB, PARITY.md).

Usage: python tools/set_fused_defaults.py [--dry-run]
"""

from __future__ import annotations

import argparse
import glob
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CFG_DIR = os.path.join(REPO, "multi_degradation_image_enhancement_tpu", "config")
AB_PATH = os.path.join(REPO, "tools", "parity", "results_r3",
                       "fused_dense_quality_ab.json")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ab", default=AB_PATH)
    ap.add_argument("--tolerance", type=float, default=0.15,
                    help="enable fused only if PSNR(on) >= PSNR(off) - tol (dB)")
    ap.add_argument("--dry-run", action="store_true")
    args = ap.parse_args()

    with open(args.ab) as f:
        ab = json.load(f)
    off, on = ab.get("fused_off", {}), ab.get("fused_on", {})
    if "psnr" not in off or "psnr" not in on:
        raise SystemExit(f"A/B incomplete: {json.dumps(ab)[:400]}")
    delta = on["psnr"] - off["psnr"]
    enable = delta >= -args.tolerance
    print(f"fused_on {on['psnr']:.3f} vs fused_off {off['psnr']:.3f} dB "
          f"(Δ {delta:+.3f}; tolerance −{args.tolerance}) -> "
          f"fused_dense={'true' if enable else 'false (left off)'}")

    changed = 0
    for path in sorted(glob.glob(os.path.join(CFG_DIR, "*.json"))):
        name = os.path.basename(path)
        if name in ("classifier_thresholds.json", "serving_tuning.json"):
            continue
        with open(path) as f:
            cfg = json.load(f)
        train = cfg.get("train")
        if not isinstance(train, dict):
            continue
        cur = bool(train.get("fused_dense", False))
        if cur == enable:
            continue
        if enable:
            train["fused_dense"] = True
        else:
            train.pop("fused_dense", None)
        changed += 1
        if not args.dry_run:
            with open(path, "w") as f:
                json.dump(cfg, f, indent=2)
                f.write("\n")
        print(f"  {'would set' if args.dry_run else 'set'} {name}: "
              f"train.fused_dense={enable}")
    print(f"{changed} config(s) {'would change' if args.dry_run else 'changed'}")


if __name__ == "__main__":
    main()
