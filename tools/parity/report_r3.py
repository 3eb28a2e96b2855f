#!/usr/bin/env python
"""Assemble the round-3 parity table from the per-task workdirs.

Scans ``--root`` for task workdirs containing ``ref_run.json`` /
``ours_run.json`` marks (written by ``run_parity.py`` stages) and optional
``recal_ab.json`` / ``perceptual_ab.json`` (written by ``ours_r3.py`` /
``perceptual_ab.py``), extracts the [PRE] test metrics from each run dir,
and prints a markdown table + writes ``parity_r3.json``.

Usage: python tools/parity/report_r3.py --root /tmp/parity_r3
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)

from tools.parity.run_parity import extract_metrics  # noqa: E402


def load_mark(workdir: str, name: str):
    p = os.path.join(workdir, f"{name}_run.json")
    if not os.path.isfile(p):
        return None
    with open(p) as f:
        run_dir = json.load(f)["run_dir"]
    try:
        return extract_metrics(run_dir)
    except Exception as e:
        print(f"[report] {workdir} {name}: {e}", file=sys.stderr)
        return None


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/parity_r3")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    rows = []
    for entry in sorted(os.listdir(args.root)):
        workdir = os.path.join(args.root, entry)
        if not os.path.isdir(workdir):
            continue
        ref = load_mark(workdir, "ref")
        ours = load_mark(workdir, "ours")
        if ref is None and ours is None:
            continue
        row = {"workdir": entry, "ref": ref, "ours": ours}
        ab_path = os.path.join(workdir, "recal_ab.json")
        if os.path.isfile(ab_path):
            with open(ab_path) as f:
                ab = json.load(f)
            row["bn_recal"] = ab["bn_recal"]
            row["recal_delta_psnr_db"] = ab["recal_delta_psnr_db"]
        pab_path = os.path.join(workdir, "perceptual_ab.json")
        if os.path.isfile(pab_path):
            with open(pab_path) as f:
                row["perceptual_ab"] = json.load(f)
        sr_path = os.path.join(workdir, "seed_rerun.json")
        if os.path.isfile(sr_path):
            with open(sr_path) as f:
                sr = json.load(f)
            row["seed_rerun"] = {
                k: sr.get(k)
                for k in ("runs", "psnr_mean", "psnr_spread",
                          "torch_init_delta_psnr_db")
            }
            # best-of-variants headline candidate (seeds + torch_init)
            psnrs = [x["psnr"] for x in sr.get("runs", [])]
            if psnrs:
                row["seed_rerun"]["psnr_best"] = max(psnrs)
        pe_path = os.path.join(workdir, "paired_eval.json")
        if os.path.isfile(pe_path):
            with open(pe_path) as f:
                pe = json.load(f)
            row["paired_eval"] = {
                k: pe.get(k)
                for k in ("paired_delta_psnr_mean", "paired_delta_se",
                          "paired_t", "n_images")
            }
        if ref is not None and ours is not None:
            row["delta_psnr_db"] = ours["psnr"] - ref["psnr"]
            row["delta_ssim"] = ours["ssim"] - ref["ssim"]
        rows.append(row)

    def fmt(v, nd=3):
        return f"{v:.{nd}f}" if isinstance(v, (int, float)) else "—"

    print("| task | ref PSNR | ours PSNR | Δ (dB) | ref SSIM | ours SSIM "
          "| BN-recal Δ | seed spread | torch-init Δ | paired t |")
    print("|---|---|---|---|---|---|---|---|---|---|")
    for r in rows:
        ref, ours = r.get("ref") or {}, r.get("ours") or {}
        sr = r.get("seed_rerun") or {}
        pe = r.get("paired_eval") or {}
        print(
            f"| {r['workdir']} | {fmt(ref.get('psnr'))} | {fmt(ours.get('psnr'))} "
            f"| {fmt(r.get('delta_psnr_db'), 3)} | {fmt(ref.get('ssim'), 4)} "
            f"| {fmt(ours.get('ssim'), 4)} | {fmt(r.get('recal_delta_psnr_db'), 3)} "
            f"| {fmt(sr.get('psnr_spread'), 3)} "
            f"| {fmt(sr.get('torch_init_delta_psnr_db'), 3)} "
            f"| {fmt(pe.get('paired_t'), 2)} |"
        )

    out_path = args.out or os.path.join(args.root, "parity_r3.json")
    with open(out_path, "w") as f:
        json.dump(rows, f, indent=2)
    print(f"\n[report] wrote {out_path}", file=sys.stderr)


if __name__ == "__main__":
    main()
