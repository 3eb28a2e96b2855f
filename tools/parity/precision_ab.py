#!/usr/bin/env python
"""Training-precision A/B on a parity task: bf16 (TPU default) vs fp32.

The round-2 parity tasks trained our side on CPU (engine default fp32) and
all won; the round-3 program moved the ours side to the TPU queue, where
the engine defaults to bf16 (`engine/model.py:198-201`) — and round 3 is
where the small losses appeared (pixelation_easy −0.42, motion_blur −0.76,
high_light −0.83, color_distortion −1.50, full_noise −0.37).  The torch
reference trains f32.  This tool retrains the ours side at the recorded
protocol (same config, same seed 42) with ``train.precision: fp32`` on the
same backend and reports the delta attributable to training precision —
the missing control variable in the round-3 comparison.

Usage:
    python tools/parity/precision_ab.py --workdir /tmp/parity_r3/color_distortion \
        --task color_distortion
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
HERE = os.path.dirname(os.path.abspath(__file__))
RESULTS = os.path.join(HERE, "results_r3")

sys.path.insert(0, REPO)

from tools.parity.run_parity import extract_metrics  # noqa: E402


def run_fp32(workdir: str, task: str) -> dict:
    cfg_path = os.path.join(workdir, f"{task}_parity.json")
    if not os.path.isfile(cfg_path):
        raise FileNotFoundError(f"{cfg_path} missing — run run_parity.py --stage data first")
    with open(cfg_path) as f:
        cfg = json.load(f)
    cfg["train"]["precision"] = "fp32"
    cfg["test"]["model_name"] = cfg["train"]["model_name"] = f"CDAN_{task}_fp32.pt"
    fp32_cfg = os.path.join(workdir, f"{task}_parity_fp32.json")
    with open(fp32_cfg, "w") as f:
        json.dump(cfg, f, indent=2)

    cwd = os.path.join(workdir, "ours_fp32")
    os.makedirs(cwd, exist_ok=True)
    env = dict(os.environ)  # production backend (TPU when tunneled)
    for phase in ("train", "test"):
        print(f"[precision-ab] {task} fp32: {phase} ...", flush=True)
        res = subprocess.run(
            [sys.executable, os.path.join(REPO, "run.py"), "-c", fp32_cfg, "-p", phase],
            cwd=cwd, env=env, capture_output=True, text=True,
        )
        sys.stdout.write(res.stdout[-2000:])
        if res.returncode != 0:
            sys.stderr.write(res.stderr[-8000:])
            raise RuntimeError(f"fp32 {phase} failed (rc={res.returncode})")
    runs = os.path.join(cwd, "runs", f"{task}_parity")
    latest = sorted(os.listdir(runs))[-1]
    return extract_metrics(os.path.join(runs, latest))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--task", required=True)
    args = ap.parse_args()

    # the recorded bf16 stock number (committed snapshot)
    stock = None
    recal_path = os.path.join(RESULTS, f"{args.task}_recal_ab.json")
    if os.path.isfile(recal_path):
        with open(recal_path) as f:
            stock = json.load(f)["stock"]

    m = run_fp32(args.workdir, args.task)
    payload = {
        "task": args.task,
        "bf16_stock": stock,
        "fp32": m,
        "delta_psnr_db": (m["psnr"] - stock["psnr"]) if stock else None,
        "delta_ssim": (m["ssim"] - stock["ssim"]) if stock else None,
        "note": "ours side retrained with train.precision=fp32 on the same "
                "backend/seed as the recorded bf16 run; reference trains f32",
    }
    os.makedirs(RESULTS, exist_ok=True)
    out = os.path.join(RESULTS, f"{args.task}_precision_ab.json")
    with open(out, "w") as f:
        json.dump(payload, f, indent=2)
    print(f"[precision-ab] {args.task}: fp32 {m['psnr']:.3f} dB"
          + (f" (bf16 stock {stock['psnr']:.3f}, Δ {m['psnr']-stock['psnr']:+.3f})" if stock else ""))
    print(f"[precision-ab] written {out}")


if __name__ == "__main__":
    main()
