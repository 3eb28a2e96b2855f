#!/usr/bin/env python
"""Run one OURS-side parity variant: clone the workdir's parity config,
apply config overrides, train+test, record metrics.

Generalizes the one-off A/B wrappers (precision_ab, seed variants) into a
single tool: any `--set dotted.key=json` override becomes a measured
variant row.  Used round 4 for the color_distortion lr-schedule A/B
(VERDICT r3 item 3: "ship a measured fix (loss-term or schedule A/B)").

Usage:
  python tools/parity/variant_run.py --workdir /root/scratch/parity_r3/full_color \
      --task color_distortion --tag cosine \
      --set train.lr_schedule='"cosine"' [--set train.seed=42]

Writes <workdir>/variant_<tag>.json: {"tag", "overrides", "psnr", "ssim"}.
Skips the (train) phase if the variant's weights already exist unless
--fresh.  Runs on the default JAX backend (TPU here).
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


def apply_override(cfg: dict, dotted: str, value) -> None:
    keys = dotted.split(".")
    node = cfg
    for k in keys[:-1]:
        node = node.setdefault(k, {})
    node[keys[-1]] = value


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--task", required=True)
    ap.add_argument("--tag", required=True)
    ap.add_argument("--set", action="append", default=[], metavar="KEY=JSON",
                    help="dotted config override, value parsed as JSON")
    ap.add_argument("--fresh", action="store_true")
    args = ap.parse_args()

    with open(os.path.join(args.workdir, f"{args.task}_parity.json")) as f:
        cfg = json.load(f)

    overrides = {}
    for item in args.set:
        key, _, raw = item.partition("=")
        value = json.loads(raw)
        overrides[key] = value
        apply_override(cfg, key, value)

    cwd = os.path.join(args.workdir, f"ours_{args.tag}")
    os.makedirs(cwd, exist_ok=True)
    cfg_path = os.path.join(args.workdir, f"{args.task}_parity_{args.tag}.json")
    with open(cfg_path, "w") as f:
        json.dump(cfg, f, indent=2)

    wpath = os.path.join(cwd, cfg["train"]["model_path"], cfg["train"]["model_name"])
    phases = ["train", "test"]
    if os.path.isfile(wpath) and not args.fresh:
        print(f"[variant_run] {args.tag}: weights exist, skipping train", flush=True)
        phases = ["test"]

    for phase in phases:
        print(f"[variant_run] {args.task} {args.tag}: {phase}", flush=True)
        res = subprocess.run(
            [sys.executable, os.path.join(REPO, "run.py"), "-c", cfg_path, "-p", phase],
            cwd=cwd, capture_output=True, text=True,
        )
        sys.stdout.write(res.stdout[-3000:])
        if res.returncode != 0:
            sys.stderr.write(res.stderr[-8000:])
            raise RuntimeError(f"{args.tag} {phase} failed (rc={res.returncode})")

    runs = os.path.join(cwd, "runs", f"{args.task}_parity")
    latest = sorted(os.listdir(runs))[-1]
    metrics = extract_metrics(os.path.join(runs, latest))
    row = {"tag": args.tag, "overrides": overrides, **metrics}
    out_path = os.path.join(args.workdir, f"variant_{args.tag}.json")
    with open(out_path, "w") as f:
        json.dump(row, f, indent=2)
    print(f"[variant_run] {json.dumps(row)} -> {out_path}", flush=True)


if __name__ == "__main__":
    main()
