"""End-to-end classifier quality: full CLI pipeline reaches a learning floor.

Runs the complete 4-stage workflow (train → tune_thresh → test →
diagnostics) of ``classification.train`` on the on-device synthetic dataset
at reduced scale and asserts real learning, tuned-thresholds artifacts, and
the diagnostics tree — the reduced-scale twin of the reference's
train_multilabel_classifier.py quality loop
(``/root/reference/classification/train_multilabel_classifier.py:827-1004``).
"""

import json
import os

import pytest


@pytest.mark.slow  # ResNet18 compile + a few CPU epochs — minutes
def test_classifier_cli_reaches_f1_floor(tmp_path):
    from multi_degradation_image_enhancement_tpu.classification import train as T

    run_dir = tmp_path / "run"
    T.main([
        "--synthetic",
        "--synthetic_images", "48",
        "--synthetic_variants", "2",
        "--epochs", "4",
        "--batch_size", "16",
        "--input_hw", "64", "96",
        "--run_dir", str(run_dir),
        "--th_steps", "7",
        "--bn_recal_passes", "2",
    ])

    # artifacts of all four stages
    for name in (
        "training.log", "history.json", "best_model.msgpack",
        "best_model.msgpack.json", "thresholds_val.json",
        "per_class_f1_val.json", "per_class_f1_test.json", "summary.json",
    ):
        assert (run_dir / name).exists(), f"missing artifact {name}"
    assert (run_dir / "diagnostics").is_dir()

    summary = json.loads((run_dir / "summary.json").read_text())
    thresholds = json.loads((run_dir / "thresholds_val.json").read_text())

    # learning floor: multi-label chance F1-micro on this label density is
    # ~0.25-0.3; four epochs from random init must clearly beat it
    assert thresholds["val_f1_micro"] >= 0.35, thresholds["val_f1_micro"]
    assert summary["test"]["f1_micro"] >= 0.30, summary["test"]["f1_micro"]
    # severity head must beat the trivial always-0.5 predictor (MAE ~0.25
    # against Beta-distributed severities on active classes)
    assert summary["test"]["sev_mae"] <= 0.30, summary["test"]["sev_mae"]

    # tuned thresholds must be consumable by run_pipeline's default lookup
    assert set(thresholds["thresholds"].keys()) == set(summary["classes"])

    # the BN-recalibration stage ran and reported its val A/B (adoption is
    # conditional on val F1 not degrading, so only the stage is asserted)
    log = (run_dir / "training.log").read_text()
    assert "BN RECALIBRATION" in log and "recalibrated=" in log
