#!/usr/bin/env python
"""Bound the random-features perceptual-term substitution (VERDICT r2 item 5).

The container has no pretrained VGG19/AlexNet weights (zero egress, no
torchvision), so ``vgg_perceptual``/``lpips`` run on seeded random frozen
features (``ops/perceptual.py`` fallback).  The 2 reference recipes that use
those terms (jpeg — ``/root/reference/config/jpeg.json:21-24`` — and
pixelation_hard) therefore train a *different* objective here.  This tool
measures the effect instead of assuming it: train our stack on the shared
jpeg parity dataset twice —

  A. jpeg-recipe loss WITH the perceptual terms on random features
     (l1 1.0 + vgg_perceptual 0.25 + ssim 0.5 + lpips 0.5, ref weights);
  B. same loss MINUS the perceptual terms (l1 1.0 + ssim 0.5);

then report restored test PSNR/SSIM of both.  |A − B| bounds what the
random-feature substitution can move on this recipe; the headline parity
rows exclude the terms on both stacks (the reference can't run them here
either).

Usage: python tools/parity/perceptual_ab.py --workdir /tmp/parity_r3/jpeg
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)

from tools.parity.run_parity import extract_metrics  # noqa: E402

ARM_LOSSES = {
    "with_perceptual": [
        {"name": "l1", "weight": 1.0},
        {"name": "vgg_perceptual", "weight": 0.25, "args": {"layers": 20}},
        {"name": "ssim", "weight": 0.5},
        {"name": "lpips", "weight": 0.5, "args": {"net": "alex"}},
    ],
    "no_perceptual": [
        {"name": "l1", "weight": 1.0},
        {"name": "ssim", "weight": 0.5},
    ],
}


def _claim(workdir: str) -> bool:
    """Single-writer guard: two queues (TPU stage D, CPU fallback) may both
    reach this A/B; the first live claimant wins, the other exits cleanly."""
    path = os.path.join(workdir, "pab_claim.pid")
    if os.path.isfile(path):
        try:
            pid = int(open(path).read().strip())
            os.kill(pid, 0)  # raises if dead
            print(f"[perceptual_ab] already running (pid {pid}); exiting", flush=True)
            return False
        except (ValueError, ProcessLookupError, PermissionError):
            pass  # stale claim — take over
    with open(path, "w") as f:
        f.write(str(os.getpid()))
    return True


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/parity_r3/jpeg")
    ap.add_argument("--task", default="jpeg")
    ap.add_argument("--cpu", action="store_true",
                    help="run both arms on JAX CPU (TPU tunnel down)")
    ap.add_argument("--epochs", type=int, default=0,
                    help="override n_epoch for BOTH arms (equal-epoch arms "
                         "still isolate the perceptual terms; use to fit a "
                         "short compute window)")
    args = ap.parse_args()

    if not _claim(args.workdir):
        return

    base_cfg_path = os.path.join(args.workdir, f"{args.task}_parity.json")
    with open(base_cfg_path) as f:
        base = json.load(f)

    env = dict(os.environ)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
    if args.cpu:
        env["PYTHONPATH"] = os.pathsep.join(
            p for p in env.get("PYTHONPATH", "").split(os.pathsep) if "axon" not in p
        )
        env["JAX_PLATFORMS"] = "cpu"
    out = {}
    for arm, terms in ARM_LOSSES.items():
        cfg = json.loads(json.dumps(base))
        cfg["loss"]["terms"] = terms
        if args.epochs:
            cfg["train"]["n_epoch"] = args.epochs
        cfg["name"] = cfg["task"] = f"{args.task}_pab_{arm}"
        cwd = os.path.join(args.workdir, f"pab_{arm}")
        os.makedirs(cwd, exist_ok=True)
        cfg_path = os.path.join(args.workdir, f"pab_{arm}.json")
        with open(cfg_path, "w") as f:
            json.dump(cfg, f, indent=2)
        for phase in ("train", "test"):
            print(f"[perceptual_ab] {arm}: {phase}", flush=True)
            res = subprocess.run(
                [sys.executable, os.path.join(REPO, "run.py"), "-c", cfg_path, "-p", phase],
                cwd=cwd, env=env, capture_output=True, text=True,
            )
            sys.stdout.write(res.stdout[-2000:])
            if res.returncode != 0:
                sys.stderr.write(res.stderr[-6000:])
                raise RuntimeError(f"{arm} {phase} failed")
        runs = os.path.join(cwd, "runs", cfg["task"])
        latest = os.path.join(runs, sorted(os.listdir(runs))[-1])
        out[arm] = extract_metrics(latest)
        print(f"[perceptual_ab] {arm}: {out[arm]}", flush=True)

    out["delta_psnr_db"] = (
        out["with_perceptual"]["psnr"] - out["no_perceptual"]["psnr"]
    )
    out["delta_ssim"] = out["with_perceptual"]["ssim"] - out["no_perceptual"]["ssim"]
    with open(os.path.join(args.workdir, "perceptual_ab.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
