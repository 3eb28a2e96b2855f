#!/usr/bin/env python
"""Generate the PARITY.md headline means table from results_r3 artifacts.

VERDICT r3 item 4: restate the scoreboard as per-stack seed means with
spreads, not single-seed rows.  Strictly artifact-driven so the table can
be regenerated as seed matrices land:

  * stock ours runs = `ours` row of parity_r3.json (seed 42) plus the
    non-torch-init rows of <task>_seed_rerun.json;
  * ref runs = `ref` row of parity_r3.json (the reference's hardcoded
    seed 42, /root/reference/utils/reproducibility.py:6) plus
    <task>_ref_seed_rerun.json rows (tools/parity/ref_seed_rerun.py);
  * torch-init variants are excluded from means (init A/B, not a seed).

Usage: python tools/parity/means_table.py [--results tools/parity/results_r3]
"""

from __future__ import annotations

import argparse
import json
import os


def _fmt(runs):
    ps = [r["psnr"] for r in runs]
    mean = sum(ps) / len(ps)
    spread = max(ps) - min(ps) if len(ps) > 1 else 0.0
    if len(ps) > 1:
        return mean, f"{mean:.2f} ± {spread:.2f} (n={len(ps)})"
    return mean, f"{mean:.2f} (n=1)"


def stock_ours_runs(row, res_dir):
    runs = [{"seed": 42, "psnr": row["ours"]["psnr"]}]
    path = os.path.join(res_dir, f"{row['workdir']}_seed_rerun.json")
    sr = row.get("seed_rerun") or (
        json.load(open(path)) if os.path.isfile(path) else {"runs": []}
    )
    for r in sr.get("runs", []):
        if r.get("torch_init") or r.get("original"):
            continue  # original seed-42 already counted from parity_r3
        runs.append(r)
    return runs


def ref_runs(row, res_dir):
    runs = [{"seed": 42, "psnr": row["ref"]["psnr"]}]
    path = os.path.join(res_dir, f"{row['workdir']}_ref_seed_rerun.json")
    if os.path.isfile(path):
        runs.extend(json.load(open(path)).get("runs", []))
    return runs


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--results", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "results_r3"))
    args = ap.parse_args()

    rows = json.load(open(os.path.join(args.results, "parity_r3.json")))
    print("| task | ref PSNR mean | ours PSNR mean | Δmean (dB) |")
    print("|---|---|---|---|")
    for row in sorted(rows, key=lambda r: r["workdir"]):
        rm, rtxt = _fmt(ref_runs(row, args.results))
        om, otxt = _fmt(stock_ours_runs(row, args.results))
        d = om - rm
        bold = "**" if abs(d) > 0.05 else ""
        print(f"| {row['workdir']} | {rtxt} | {otxt} | {bold}{d:+.2f}{bold} |")


if __name__ == "__main__":
    main()
