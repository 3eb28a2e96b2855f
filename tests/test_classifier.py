"""Classifier components: ResNet18 structure, metrics math, dataset/loader."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multi_degradation_image_enhancement_tpu.classification import metrics as M
from multi_degradation_image_enhancement_tpu.models.resnet import ResNet18Features

TORCHVISION_RESNET18_BACKBONE_PARAMS = 11_176_512  # resnet18 minus fc


def test_resnet18_param_count_matches_torchvision():
    model = ResNet18Features()
    variables = jax.eval_shape(
        lambda: model.init(
            {"params": jax.random.key(0)}, jnp.zeros((1, 64, 96, 3)), train=False
        )
    )
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(variables["params"]))
    assert n == TORCHVISION_RESNET18_BACKBONE_PARAMS


def test_multihead_classifier_shapes():
    from multi_degradation_image_enhancement_tpu.classification.model import (
        MultiHeadClassifier,
    )

    model = MultiHeadClassifier(num_classes=9)
    x = jnp.zeros((2, 64, 96, 3), jnp.float32)
    variables = model.init({"params": jax.random.key(0)}, x, train=False)
    cls_logits, sev_logits = model.apply(variables, x, train=False)
    assert cls_logits.shape == (2, 9)
    assert sev_logits.shape == (2, 9)


def test_f1_math_known_values():
    y_true = np.array([[1, 0], [1, 1], [0, 1], [0, 0]], np.float32)
    y_pred = np.array([[1, 0], [1, 0], [0, 1], [0, 1]], np.float32)
    # tp=3, fp=1, fn=1 → prec=rec=0.75 → micro F1 = 0.75
    micro, macro = M.f1_micro_macro(y_true, y_pred)
    assert micro == pytest.approx(0.75, abs=1e-6)
    by_class = M.per_class_f1(y_true, y_pred, ["a", "b"])
    assert by_class["a"] == pytest.approx(1.0, abs=1e-6)
    assert by_class["b"] == pytest.approx(0.5, abs=1e-6)
    assert macro == pytest.approx(0.75, abs=1e-6)


def test_severity_mae_masking():
    y = np.array([[1, 0]], np.float32)
    s_true = np.array([[0.6, 0.9]], np.float32)
    s_pred = np.array([[0.4, 0.1]], np.float32)
    # only the positive label contributes
    assert M.severity_mae(y, s_true, s_pred) == pytest.approx(0.2, abs=1e-6)
    assert np.isnan(M.severity_mae(np.zeros((1, 2)), s_true, s_pred))


def test_threshold_tuning_finds_separator():
    rng = np.random.RandomState(0)
    n = 200
    y = (rng.rand(n, 1) > 0.5).astype(np.float32)
    # positives score ~0.8, negatives ~0.3 → best threshold in between
    probs = np.where(y > 0.5, 0.8, 0.3) + rng.randn(n, 1) * 0.02
    report = M.tune_thresholds_per_class_for_f1(
        probs.astype(np.float32), y, ["c"], list(np.linspace(0.05, 0.95, 19))
    )
    assert 0.3 <= report["thresholds"]["c"] <= 0.8
    assert report["val_f1_micro"] > 0.99


def test_average_precision_perfect_ranking():
    y = np.array([1, 1, 0, 0], np.int32)
    scores = np.array([0.9, 0.8, 0.2, 0.1])
    prec, rec, _ = M.precision_recall_curve_binary(y, scores)
    assert M.average_precision(prec, rec) == pytest.approx(1.0, abs=1e-6)


def test_pos_weight():
    rows = [
        {"labels": {"a": 1, "b": 0}},
        {"labels": {"a": 1, "b": 0}},
        {"labels": {"a": 0, "b": 1}},
        {"labels": {"a": 0, "b": 0}},
    ]
    w = M.compute_pos_weight(rows, ["a", "b"])
    assert w[0] == pytest.approx(1.0)  # 2 neg / 2 pos
    assert w[1] == pytest.approx(3.0)  # 3 neg / 1 pos


def test_classifier_dataset_and_loader(tmp_path):
    from PIL import Image

    from multi_degradation_image_enhancement_tpu.classification.data import (
        ClassifierLoader,
        MultiLabelSeverityDataset,
    )

    root = tmp_path / "ds"
    img_dir = root / "train" / "images"
    os.makedirs(img_dir)
    classes = ["blur", "noise"]
    rng = np.random.RandomState(0)
    rows = []
    for i in range(5):
        name = f"x_{i}.png"
        Image.fromarray(rng.randint(0, 255, (16, 24, 3), dtype=np.uint8)).save(img_dir / name)
        rows.append(
            {
                "file": f"train/images/{name}",
                "labels": {"blur": i % 2, "noise": 1 - i % 2},
                "severity": {"blur": 0.5 * (i % 2), "noise": 0.3},
            }
        )
    with open(root / "train" / "labels.jsonl", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")

    ds = MultiLabelSeverityDataset(str(root), "train", classes, input_hw=(16, 24))
    assert len(ds) == 5
    loader = ClassifierLoader(ds, batch_size=2, shuffle=False, augment=False, normalize=True)
    x, y, s, paths = next(iter(loader))
    assert x.shape == (2, 16, 24, 3)
    assert y.shape == (2, 2) and s.shape == (2, 2)
    assert paths[0] == "train/images/x_0.png"
    # ImageNet normalization applied → values not in [0,1]
    assert float(x.min()) < 0.0
