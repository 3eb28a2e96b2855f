#!/usr/bin/env python
"""Rebuild the ephemeral /tmp parity workdirs from committed round-3 results.

The round-3 measurement program runs in /tmp workdirs (fast, ephemeral) with
its evidence snapshotted into ``tools/parity/results_r3/`` by
``snapshot_r3.sh``.  A VM reset wipes /tmp: the idempotent skip logic in
``ours_r3.py`` (skips tasks with ``recal_ab.json``), ``seed_rerun.py --auto``
(plans from ``ref_run.json`` + ``recal_ab.json`` + prior ``seed_rerun.json``)
and the queue's paired-eval stage (skips tasks with ``paired_eval.json``)
would all forget what already ran, and ``report_r3.py`` would emit a table
missing the completed rows — which the snapshot loop would then commit over
the good one.

This restores each task workdir from the committed artifacts:

- per-task ``recal_ab.json`` / ``seed_rerun.json`` / ``paired_eval.json`` /
  ``perceptual_ab.json`` copied back verbatim;
- ``ref_run.json`` / ``ours_run.json`` marks re-pointed at tiny synthesized
  run dirs whose ``test.jsonl`` carries the committed [PRE] metrics (the
  real run dirs are gone; ``extract_metrics`` only reads that one row).
  The ours metrics come from ``recal_ab.json``'s ``stock`` block — the
  committed headline numbers.

It does NOT regenerate datasets/configs (those are deterministic;
``run_parity.py --stage data`` recreates them when a stage needs to train
again — pass ``--data-tasks`` to pre-generate for tasks the seed-rerun
queue will touch).

Usage: python tools/parity/restore_r3.py --root /tmp/parity_r3
           [--data-tasks motion_blur,pixelation_easy,high_light]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
RESULTS = os.path.join(REPO, "tools", "parity", "results_r3")


def synth_run_dir(workdir: str, name: str, psnr: float, ssim: float) -> str:
    """Write a minimal run dir whose test.jsonl satisfies extract_metrics."""
    run_dir = os.path.join(workdir, f"{name}_restored")
    os.makedirs(run_dir, exist_ok=True)
    row = {
        "type": "test",
        "stage": "pre",
        "metric_psnr": psnr,
        "metric_ssim": ssim,
        "restored_from": "tools/parity/results_r3 (committed round-3 snapshot)",
    }
    with open(os.path.join(run_dir, "test.jsonl"), "w") as f:
        f.write(json.dumps(row) + "\n")
    return run_dir


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/parity_r3")
    ap.add_argument("--data-tasks", default="",
                    help="comma-separated tasks to also regenerate dataset+config "
                         "for (runs run_parity --stage data at the r3 protocol shape)")
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--height", type=int, default=128)
    ap.add_argument("--width", type=int, default=192)
    args = ap.parse_args()

    table_path = os.path.join(RESULTS, "parity_r3.json")
    with open(table_path) as f:
        rows = json.load(f)

    for row in rows:
        task = row["workdir"]
        workdir = os.path.join(args.root, task)
        os.makedirs(workdir, exist_ok=True)

        ref = row.get("ref")
        if ref and not os.path.isfile(os.path.join(workdir, "ref_run.json")):
            run_dir = synth_run_dir(workdir, "ref", ref["psnr"], ref["ssim"])
            with open(os.path.join(workdir, "ref_run.json"), "w") as f:
                json.dump({"run_dir": run_dir}, f)
            print(f"[restore] {task}: ref mark ({ref['psnr']:.3f} dB)")

        for name in ("recal_ab", "seed_rerun", "paired_eval", "perceptual_ab"):
            src = os.path.join(RESULTS, f"{task}_{name}.json")
            dst = os.path.join(workdir, f"{name}.json")
            if os.path.isfile(src) and not os.path.isfile(dst):
                shutil.copyfile(src, dst)
                print(f"[restore] {task}: {name}.json")

        ab_path = os.path.join(workdir, "recal_ab.json")
        if os.path.isfile(ab_path) and not os.path.isfile(
            os.path.join(workdir, "ours_run.json")
        ):
            with open(ab_path) as f:
                stock = json.load(f)["stock"]
            run_dir = synth_run_dir(workdir, "ours", stock["psnr"], stock["ssim"])
            with open(os.path.join(workdir, "ours_run.json"), "w") as f:
                json.dump({"run_dir": run_dir}, f)
            print(f"[restore] {task}: ours mark ({stock['psnr']:.3f} dB)")

    for task in [t for t in args.data_tasks.split(",") if t]:
        workdir = os.path.join(args.root, task)
        if os.path.isfile(os.path.join(workdir, f"{task}_parity.json")):
            print(f"[restore] {task}: dataset/config already present")
            continue
        print(f"[restore] {task}: regenerating dataset + config", flush=True)
        subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "parity", "run_parity.py"),
             "--workdir", workdir, "--task", task, "--stage", "data",
             "--epochs", str(args.epochs), "--batch", str(args.batch),
             "--height", str(args.height), "--width", str(args.width)],
            check=True,
        )
    print("[restore] done")


if __name__ == "__main__":
    main()
