"""End-to-end smoke of the serving CLI (run_pipeline.py) as a subprocess.

Builds the two artifacts the CLI requires — a classifier checkpoint
(classification/train.py save format) and one engine CDAN weight file
(engine/checkpoint format, as training writes) — then streams a tiny
degraded directory through classify → route → restore → PNG out.  Covers
the plumbing the unit tests can't: argparse contract, checkpoint template
round-trips, streaming IO wiring, probs.jsonl schema.
"""

import json
import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import serialization
from PIL import Image

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
HW = (32, 48)  # multiples of 8 (CDAN pool/upsample structure)


@pytest.mark.slow
def test_serving_cli_end_to_end(tmp_path):
    from multi_degradation_image_enhancement_tpu.classification.model import (
        MultiHeadClassifier,
    )
    from multi_degradation_image_enhancement_tpu.engine.checkpoint import save_weights
    from multi_degradation_image_enhancement_tpu.models.cdan import CDAN
    from multi_degradation_image_enhancement_tpu.ops.degradations import DEGRADATIONS

    img_dir, out_dir, wdir = tmp_path / "deg", tmp_path / "out", tmp_path / "weights"
    img_dir.mkdir()
    wdir.mkdir()
    rng = np.random.RandomState(5)
    for i in range(3):
        Image.fromarray(rng.randint(0, 255, (HW[0], HW[1], 3), np.uint8)).save(
            img_dir / f"im{i}.png"
        )

    clf = MultiHeadClassifier(num_classes=len(DEGRADATIONS), dtype=jnp.float32)
    cv = clf.init(
        {"params": jax.random.key(0)}, jnp.zeros((1, *HW, 3), jnp.float32), train=False
    )
    ckpt = tmp_path / "clf.msgpack"
    ckpt.write_bytes(
        serialization.to_bytes(
            {
                "params": jax.device_get(cv["params"]),
                "batch_stats": jax.device_get(cv["batch_stats"]),
            }
        )
    )
    (tmp_path / "clf.msgpack.json").write_text(
        json.dumps({"classes": list(DEGRADATIONS)})
    )

    net = CDAN(dtype=jnp.float32)
    nv = net.init(
        {"params": jax.random.key(1), "dropout": jax.random.key(2)},
        jnp.zeros((1, *HW, 3), jnp.float32),
        train=False,
    )
    save_weights(str(wdir / "CDAN_noise.pt"), nv["params"], nv["batch_stats"])

    res = subprocess.run(
        [
            sys.executable, os.path.join(REPO, "run_pipeline.py"),
            "--images", str(img_dir), "--out", str(out_dir),
            "--classifier", str(ckpt), "--weights-dir", str(wdir),
            "--batch", "2", "--input-hw", str(HW[0]), str(HW[1]),
            "--save-probs", "--io-threads", "2",
        ],
        capture_output=True, text=True, timeout=1200,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
        cwd=REPO,
    )
    assert res.returncode == 0, res.stderr[-4000:]

    for i in range(3):
        restored = np.asarray(Image.open(out_dir / f"im{i}.png"))
        assert restored.shape == (HW[0], HW[1], 3)
    rows = [
        json.loads(line)
        for line in (out_dir / "probs.jsonl").read_text().splitlines()
    ]
    assert [r["file"] for r in rows] == ["im0.png", "im1.png", "im2.png"]
    assert set(rows[0]["probs"]) == {"noise"}  # only the loaded expert

    # severity-ordered sequential mode through the same CLI (the ordering
    # path pulls the classifier's severity head into the router)
    out2 = tmp_path / "out_seq"
    res = subprocess.run(
        [
            sys.executable, os.path.join(REPO, "run_pipeline.py"),
            "--images", str(img_dir), "--out", str(out2),
            "--classifier", str(ckpt), "--weights-dir", str(wdir),
            "--batch", "2", "--input-hw", str(HW[0]), str(HW[1]),
            "--mode", "sequential", "--ordering", "severity",
            "--io-threads", "2",
        ],
        capture_output=True, text=True, timeout=1200,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
        cwd=REPO,
    )
    assert res.returncode == 0, res.stderr[-4000:]
    for i in range(3):
        assert (out2 / f"im{i}.png").is_file()


def test_resolve_thresholds_merges_per_class(tmp_path):
    """ADVICE r2: a run thresholds file lacking some classes must fall back
    to the packaged defaults for those classes, not to flat 0.5 — and the
    reported source is the last file that actually contributed."""
    import json

    from run_pipeline import resolve_thresholds

    classes = ["noise", "blur", "jpeg"]
    packaged = tmp_path / "packaged.json"
    packaged.write_text(json.dumps({"thresholds": {"noise": 0.3, "blur": 0.4, "jpeg": 0.6}}))
    run = tmp_path / "thresholds_val.json"
    run.write_text(json.dumps({"thresholds": {"noise": 0.7}}))

    thr, source = resolve_thresholds(classes, str(packaged), str(run))
    assert thr == [0.7, 0.4, 0.6]  # run wins where present, packaged fills the rest
    assert source == str(run)

    # no run file -> packaged only
    thr, source = resolve_thresholds(classes, str(packaged), str(tmp_path / "missing.json"))
    assert thr == [0.3, 0.4, 0.6]
    assert source == str(packaged)

    # neither file -> flat 0.5
    thr, source = resolve_thresholds(classes, str(tmp_path / "a.json"), str(tmp_path / "b.json"))
    assert thr == [0.5, 0.5, 0.5]
    assert source == "flat 0.5"
