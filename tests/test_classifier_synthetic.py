"""On-device synthetic classifier data: planning determinism + batch semantics."""

import numpy as np
import pytest

from multi_degradation_image_enhancement_tpu.classification.synthetic import (
    SyntheticClassifierDataset,
    SyntheticClassifierLoader,
)
from multi_degradation_image_enhancement_tpu.datasets_generation.generate_classifier import (
    PIPELINES,
    plan_variant,
)


def test_plan_variant_is_md5_stable():
    p1 = plan_variant("img_001.png", 0, 42)
    p2 = plan_variant("img_001.png", 0, 42)
    assert p1 == p2
    p3 = plan_variant("img_001.png", 1, 42)
    assert p1 != p3 or p1["chosen"] == []  # different variant → (almost surely) different plan


def test_plan_distribution_shape():
    plans = [plan_variant(f"img_{i:04d}.png", v, 42) for i in range(200) for v in range(2)]
    n_clean = sum(1 for p in plans if not p["chosen"])
    # ~10% clean samples (reference CLEAN_SAMPLE_PROB)
    assert 0.04 < n_clean / len(plans) < 0.18
    counts = [len(p["chosen"]) for p in plans if p["chosen"]]
    # co-occurrence bias can push counts above 3
    assert max(counts) <= 6
    assert np.mean(counts) < 2.5
    sevs = [s for p in plans for s in p["severities"].values()]
    assert 0.0 <= min(sevs) and max(sevs) <= 1.0
    assert np.mean(sevs) < 0.5  # Beta(2,5)-dominated


def test_loader_batches_group_by_template_and_degrade():
    ds = SyntheticClassifierDataset(
        split="train", n_images=8, variants_per_image=2, input_hw=(32, 48)
    )
    assert len(ds) == 16
    loader = SyntheticClassifierLoader(ds, batch_size=4, shuffle=False, augment=False,
                                       normalize=False)
    seen = 0
    for x, y, s, ids in loader:
        assert x.shape[1:] == (32, 48, 3)
        assert y.shape[1] == 9 and s.shape[1] == 9
        # severity only set where label set
        assert float((np.asarray(s) * (1 - np.asarray(y))).max()) == 0.0
        # values in [0,1] (normalize=False)
        assert float(x.min()) >= 0.0 and float(x.max()) <= 1.0
        seen += x.shape[0]
    assert seen == 16


def test_degraded_samples_differ_from_clean():
    import jax.numpy as jnp

    ds = SyntheticClassifierDataset(
        split="train", n_images=6, variants_per_image=1, input_hw=(32, 48)
    )
    loader = SyntheticClassifierLoader(ds, batch_size=6, shuffle=False, augment=False,
                                       normalize=False)
    x, y, s, ids = next(iter(loader))
    for j, sid in enumerate(ids):
        name = sid.split("::")[0]
        idx = ds.names.index(name)
        clean01 = ds.clean_image(idx).astype(np.float32) / 255.0
        degraded = np.asarray(x[j])
        if float(np.asarray(y[j]).sum()) == 0:
            np.testing.assert_allclose(degraded, clean01, atol=1e-5)
        else:
            assert np.abs(degraded - clean01).max() > 0.005


def test_labels_rows_match_samples():
    ds = SyntheticClassifierDataset(split="train", n_images=4, variants_per_image=2,
                                    input_hw=(16, 24))
    rows = ds.labels_rows()
    assert len(rows) == len(ds)
    for row, (_, _, plan, _) in zip(rows, ds.samples):
        for c in ds.classes:
            assert row["labels"][c] == int(c in plan["chosen"])
