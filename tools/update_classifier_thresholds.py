#!/usr/bin/env python
"""Regenerate the packaged router thresholds from a classifier run.

``run_pipeline.py`` routes images to per-degradation restorers using
per-class probability thresholds; its packaged defaults live in
``multi_degradation_image_enhancement_tpu/config/classifier_thresholds.json``.
VERDICT r2 item 6 asked that those defaults be traceable to a
reference-scale run — this tool rewrites the packaged file from a completed
``classification.train`` run directory (``thresholds_val.json`` +
``summary.json``), embedding full provenance.

Usage: python tools/update_classifier_thresholds.py \
         --run runs_classifier/r3_scale [--note "..."] [--dry-run]
"""

from __future__ import annotations

import argparse
import datetime
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(
    REPO, "multi_degradation_image_enhancement_tpu", "config",
    "classifier_thresholds.json",
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--run", required=True, help="classifier run dir")
    ap.add_argument("--note", default="", help="extra provenance text")
    ap.add_argument("--dry-run", action="store_true")
    args = ap.parse_args()

    with open(os.path.join(args.run, "thresholds_val.json")) as f:
        report = json.load(f)
    with open(os.path.join(args.run, "summary.json")) as f:
        summary = json.load(f)

    # Sanity: the tuned thresholds the test phase actually used must match
    # the tuning report (same run, no stale file mixing).
    used = summary.get("tuned_thresholds_used", {})
    for c, t in report["thresholds"].items():
        if c in used and abs(used[c] - t) > 1e-9:
            raise SystemExit(
                f"{c}: thresholds_val.json ({t}) != summary.json used ({used[c]})"
                " — stale run artifacts?"
            )

    payload = {
        "_provenance": {
            "source": f"classification.train run at {args.run}"
                      + (f" — {args.note}" if args.note else ""),
            "date": datetime.date.today().isoformat(),
            "val_f1_micro_tuned": report.get("val_f1_micro"),
            "val_f1_macro_tuned": report.get("val_f1_macro"),
            "test_f1_micro": summary["test"]["f1_micro"],
            "test_f1_macro": summary["test"]["f1_macro"],
            "test_severity_mae": summary["test"]["sev_mae"],
            "best_epoch": summary.get("best_epoch"),
            "backend": summary.get("backend"),
        },
        "thresholds": report["thresholds"],
    }
    text = json.dumps(payload, indent=1)
    if args.dry_run:
        print(text)
        return
    with open(OUT, "w") as f:
        f.write(text + "\n")
    print(f"wrote {OUT}")
    print(text)


if __name__ == "__main__":
    main()
