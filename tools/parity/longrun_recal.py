#!/usr/bin/env python
"""BN-recalibration A/B for an already-trained parity workdir (longrun).

The round-3 ours driver (``tools/parity/ours_r3.py``) bundles train + recal
A/B; the full-scale 80-epoch longrun (VERDICT r2 item 4) trains through
``run_parity.py --stage ours`` directly, so its checkpoint never got the
A/B.  This runs just that part: recalibrate the existing checkpoint
(3 passes over the train split, frozen weights — ``tools/recalibrate_bn.py``),
re-run the test phase, record both readings in ``<workdir>/recal_ab.json``,
and restore the stock checkpoint so the headline row stays stock-training.

Usage: python tools/parity/longrun_recal.py --workdir /tmp/parity_r3/full_noise \
         --task noise [--passes 3] [--cpu]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)

from tools.parity.run_parity import extract_metrics  # noqa: E402


def sh(cmd, cwd=None, env=None) -> None:
    print(f"[longrun_recal] $ {' '.join(cmd)}", flush=True)
    res = subprocess.run(cmd, cwd=cwd, env=env, capture_output=True, text=True)
    sys.stdout.write(res.stdout[-3000:])
    if res.returncode != 0:
        sys.stderr.write(res.stderr[-8000:])
        raise RuntimeError(f"command failed rc={res.returncode}: {cmd}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--task", required=True)
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--suffix", default="",
                    help="seed-variant suffix (e.g. _seed1337): reads "
                         "<task>_parity<suffix>.json / ours<suffix>/, takes "
                         "the latest existing run as stock, and writes "
                         "recal_ab<suffix>.json")
    args = ap.parse_args()

    workdir = args.workdir
    ours_cwd = os.path.join(workdir, f"ours{args.suffix}")
    cfg_path = os.path.join(workdir, f"{args.task}_parity{args.suffix}.json")
    # the checkpoint name comes from the config (build_config keeps the
    # reference noise recipe's "CDAN_noise_parity.pt" for every task)
    with open(cfg_path) as f:
        cfg = json.load(f)
    test_cfg = cfg.get("test", {})
    weights = os.path.join(
        ours_cwd,
        test_cfg.get("model_path", "weights/"),
        test_cfg.get("model_name", f"CDAN_{args.task}_parity.pt"),
    )

    env = dict(os.environ)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
    if args.cpu:
        env["PYTHONPATH"] = os.pathsep.join(
            p for p in env.get("PYTHONPATH", "").split(os.pathsep) if "axon" not in p
        )
        env["JAX_PLATFORMS"] = "cpu"

    if args.suffix:
        runs = os.path.join(ours_cwd, "runs", f"{args.task}_parity")
        stock_run = os.path.join(runs, sorted(os.listdir(runs))[-1])
    else:
        with open(os.path.join(workdir, "ours_run.json")) as f:
            stock_run = json.load(f)["run_dir"]
    stock = extract_metrics(stock_run)

    stock_copy = weights + ".stock"
    shutil.copyfile(weights, stock_copy)
    try:
        sh([sys.executable, os.path.join(REPO, "tools", "recalibrate_bn.py"),
            "-c", cfg_path, "--passes", str(args.passes)], cwd=ours_cwd, env=env)
        sh([sys.executable, os.path.join(REPO, "run.py"), "-c", cfg_path, "-p", "test"],
           cwd=ours_cwd, env=env)
        runs = os.path.join(ours_cwd, "runs", f"{args.task}_parity")
        recal_run = os.path.join(runs, sorted(os.listdir(runs))[-1])
        recal = extract_metrics(recal_run)
    finally:
        shutil.copyfile(stock_copy, weights)

    ab = {
        "task": args.task + args.suffix,
        "stock": stock,
        "bn_recal": recal,
        "recal_delta_psnr_db": recal["psnr"] - stock["psnr"],
        "recal_delta_ssim": recal["ssim"] - stock["ssim"],
        "passes": args.passes,
    }
    with open(os.path.join(workdir, f"recal_ab{args.suffix}.json"), "w") as f:
        json.dump(ab, f, indent=2)
    print(f"[longrun_recal] {args.task}: stock {stock['psnr']:.3f} dB, "
          f"recal {recal['psnr']:.3f} dB (Δ {ab['recal_delta_psnr_db']:+.3f})",
          flush=True)


if __name__ == "__main__":
    main()
