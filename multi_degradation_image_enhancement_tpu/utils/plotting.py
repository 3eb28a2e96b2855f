"""Loss-curve plots from train.csv (reference ``utils/plotting.py:41-91``).

Renders one PNG per ``loss_*`` column, plus a combined plot, from the epoch
rows of a training CSV.  Uses matplotlib's Agg backend (headless).
"""

from __future__ import annotations

import csv
import os
from typing import Dict, List, Tuple

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


def _epoch_rows(train_csv: str) -> Tuple[List[int], List[Dict[str, float]]]:
    epochs: List[int] = []
    rows: List[Dict[str, float]] = []
    with open(train_csv, "r", encoding="utf-8") as f:
        reader = csv.DictReader(f)
        if reader.fieldnames is None:
            return epochs, rows
        has_type = "type" in reader.fieldnames
        for r in reader:
            if has_type and r.get("type") != "epoch":
                continue
            if not r.get("epoch"):
                continue
            parsed = {}
            for k, v in r.items():
                try:
                    parsed[k] = float(v)
                except (TypeError, ValueError):
                    continue
            epochs.append(int(float(r["epoch"])))
            rows.append(parsed)
    return epochs, rows


def _plot(x, series: Dict[str, List[float]], title: str, path: str) -> None:
    plt.figure()
    for name, y in series.items():
        plt.plot(x, y, label=name if len(series) > 1 else None)
    plt.xlabel("Epoch")
    plt.ylabel(title)
    plt.title(title)
    if len(series) > 1:
        plt.legend()
    plt.grid(True)
    plt.tight_layout()
    plt.savefig(path, dpi=150)
    plt.close()


def plot_losses_from_csv(train_csv: str, out_dir: str) -> None:
    epochs, rows = _epoch_rows(train_csv)
    if not epochs:
        return
    os.makedirs(out_dir, exist_ok=True)
    keys = sorted({k for r in rows for k in r if k.startswith("loss_")})
    if not keys:
        return
    series = {k: [r.get(k, float("nan")) for r in rows] for k in keys}
    if "loss_total" in series:
        _plot(epochs, {"loss_total": series["loss_total"]}, "loss_total",
              os.path.join(out_dir, "loss_total.png"))
    for k, y in series.items():
        if k != "loss_total":
            _plot(epochs, {k: y}, k, os.path.join(out_dir, f"{k}.png"))
    _plot(epochs, series, "Loss curves", os.path.join(out_dir, "loss_all.png"))
