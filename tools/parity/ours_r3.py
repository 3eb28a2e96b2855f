#!/usr/bin/env python
"""Round-3 ours-side parity driver (runs on TPU while the torch ref queue
owns the CPU).

For each task workdir: run the harness ``--stage ours --ours-tpu`` (train +
test on the shared reference-generated dataset), then the BN-recalibration
A/B (VERDICT r2 item 3): recalibrate the checkpoint (3 passes), re-run the
test phase, record both PSNR/SSIM readings in ``<workdir>/recal_ab.json``,
and restore the stock checkpoint so the marked ours run stays the headline.

Usage: python tools/parity/ours_r3.py --root /tmp/parity_r3 --tasks jpeg,...
       [--epochs 30 --batch 4 --height 128 --width 192]
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


def sh(cmd, cwd=None, env=None) -> str:
    print(f"[ours_r3] $ {' '.join(cmd)}", flush=True)
    res = subprocess.run(cmd, cwd=cwd, env=env, capture_output=True, text=True)
    sys.stdout.write(res.stdout[-3000:])
    if res.returncode != 0:
        sys.stderr.write(res.stderr[-8000:])
        raise RuntimeError(f"command failed rc={res.returncode}: {cmd}")
    return res.stdout


def run_task(root: str, task: str, epochs: int, batch: int, h: int, w: int,
             cpu: bool = False) -> dict:
    workdir = os.path.join(root, task)
    harness = os.path.join(REPO, "tools", "parity", "run_parity.py")
    env = dict(os.environ)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
    if cpu:
        # CPU fallback (the axon TPU tunnel goes down for hours at a time):
        # same env surgery run_parity applies for its default CPU ours stage,
        # also applied to the recal/test subprocesses below.
        env["PYTHONPATH"] = os.pathsep.join(
            p for p in env.get("PYTHONPATH", "").split(os.pathsep) if "axon" not in p
        )
        env["JAX_PLATFORMS"] = "cpu"

    sh(
        [sys.executable, harness, "--workdir", workdir, "--task", task,
         "--epochs", str(epochs), "--batch", str(batch),
         "--height", str(h), "--width", str(w), "--stage", "ours"]
        + ([] if cpu else ["--ours-tpu"]),
        env=env,
    )
    with open(os.path.join(workdir, "ours_run.json")) as f:
        stock_run = json.load(f)["run_dir"]
    stock = extract_metrics(stock_run)

    # ---- BN-recalibration A/B --------------------------------------------
    ours_cwd = os.path.join(workdir, "ours")
    cfg_path = os.path.join(workdir, f"{task}_parity.json")
    # harness configs use a fixed model_name regardless of task (per-cwd)
    weights = os.path.join(ours_cwd, "weights", "CDAN_noise_parity.pt")
    stock_copy = weights + ".stock"
    shutil.copyfile(weights, stock_copy)
    try:
        sh(
            [sys.executable, os.path.join(REPO, "tools", "recalibrate_bn.py"),
             "-c", cfg_path, "--passes", "3"],
            cwd=ours_cwd, env=env,
        )
        sh([sys.executable, os.path.join(REPO, "run.py"), "-c", cfg_path, "-p", "test"],
           cwd=ours_cwd, env=env)
        runs = os.path.join(ours_cwd, "runs", f"{task}_parity")
        recal_run = os.path.join(runs, sorted(os.listdir(runs))[-1])
        recal = extract_metrics(recal_run)
    finally:
        shutil.copyfile(stock_copy, weights)  # headline = stock training

    ab = {
        "task": task,
        "stock": stock,
        "bn_recal": recal,
        "recal_delta_psnr_db": recal["psnr"] - stock["psnr"],
        "recal_delta_ssim": recal["ssim"] - stock["ssim"],
        "passes": 3,
        "protocol": {"epochs": epochs, "batch": batch, "resolution": [h, w]},
    }
    with open(os.path.join(workdir, "recal_ab.json"), "w") as f:
        json.dump(ab, f, indent=2)
    print(f"[ours_r3] {task}: stock {stock['psnr']:.3f} dB, "
          f"recal {recal['psnr']:.3f} dB (Δ {ab['recal_delta_psnr_db']:+.3f})", flush=True)
    return ab


def _active_worker(workdir: str, fresh_s: float = 900.0):
    """Detect a concurrently-running ours stage on this task.

    The round runs two workers over one task list (a CPU fallback chain and
    the TPU queue, meeting from opposite ends); both continuously touch
    files under ``<workdir>/ours`` while training.  Any file there modified
    within ``fresh_s`` seconds means another worker owns the task — skip it
    rather than corrupt its shared checkpoint path.
    """
    import time

    ours = os.path.join(workdir, "ours")
    newest = None
    for dirpath, _dirnames, filenames in os.walk(ours):
        for fn in filenames:
            try:
                m = os.path.getmtime(os.path.join(dirpath, fn))
            except OSError:
                continue
            if newest is None or m > newest:
                newest = m
    if newest is not None and (time.time() - newest) < fresh_s:
        age = time.time() - newest
        return f"files under {ours} touched {age:.0f}s ago"
    return None


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/parity_r3")
    ap.add_argument("--tasks", required=True, help="comma-separated task list")
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--height", type=int, default=128)
    ap.add_argument("--width", type=int, default=192)
    ap.add_argument("--cpu", action="store_true",
                    help="run the ours stage on JAX CPU (TPU tunnel down)")
    args = ap.parse_args()

    failures = []
    for task in args.tasks.split(","):
        task = task.strip()
        if not task:
            continue
        if os.path.exists(os.path.join(args.root, task, "recal_ab.json")):
            print(f"[ours_r3] {task}: recal_ab.json exists, skipping", flush=True)
            continue
        owner = _active_worker(os.path.join(args.root, task))
        if owner is not None:
            print(f"[ours_r3] {task}: another worker is active ({owner}), skipping",
                  flush=True)
            continue
        # The axon-tunneled TPU backend intermittently refuses to initialize
        # ("TPU backend setup/compile error (Unavailable)"), typically under
        # contention; retry each task a few times before recording a failure.
        last_err = None
        for attempt in range(3):
            try:
                run_task(args.root, task, args.epochs, args.batch,
                         args.height, args.width, cpu=args.cpu)
                last_err = None
                break
            except Exception as e:  # keep the queue moving; record the failure
                last_err = e
                print(f"[ours_r3] {task} attempt {attempt + 1} FAILED: {e}", flush=True)
                import time
                time.sleep(60)
        if last_err is not None:
            failures.append(task)
    if failures:
        print(f"[ours_r3] failed tasks: {failures}", flush=True)
        sys.exit(1)
    print("[ours_r3] all tasks complete", flush=True)


if __name__ == "__main__":
    main()
