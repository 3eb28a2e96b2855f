"""Clean-image selector (SURVEY C15) on a synthetic class-per-dir corpus.

The reference selector (/root/reference/datasets_generation/
select_clean_images_imagenet.py:13-16,57-61) samples seed-42-shuffled
classes and copies images flat with ``<class>__<name>`` prefixes; this
container has no ImageNet, so the test builds a tiny fake tree.
"""

import os

from PIL import Image

from multi_degradation_image_enhancement_tpu.datasets_generation.select_clean_images import main


def _make_corpus(root, n_classes=5, per_class=4):
    for c in range(n_classes):
        cls = os.path.join(root, f"n{c:08d}")
        os.makedirs(cls)
        for i in range(per_class):
            Image.new("RGB", (8, 8), (c * 40 % 256, i * 60 % 256, 0)).save(
                os.path.join(cls, f"img_{i}.png")
            )


def test_selector_flat_prefixes_and_counts(tmp_path):
    src = tmp_path / "imagenet"
    out = tmp_path / "clean"
    os.makedirs(src)
    _make_corpus(str(src))

    main([
        "--imagenet-dir", str(src), "--out", str(out),
        "--num-classes", "3", "--images-per-class", "2", "--seed", "42",
    ])

    files = sorted(os.listdir(out))
    assert len(files) == 6  # 3 classes x 2 images
    for f in files:
        cls, _, name = f.partition("__")
        assert cls.startswith("n") and name.startswith("img_")
        # source must exist under that class dir
        assert os.path.isfile(src / cls / name)


def test_selector_seed_determinism(tmp_path):
    src = tmp_path / "imagenet"
    os.makedirs(src)
    _make_corpus(str(src), n_classes=8, per_class=6)

    picks = []
    for run in range(2):
        out = tmp_path / f"out{run}"
        main([
            "--imagenet-dir", str(src), "--out", str(out),
            "--num-classes", "4", "--images-per-class", "3", "--seed", "42",
        ])
        picks.append(sorted(os.listdir(out)))
    assert picks[0] == picks[1]

    out = tmp_path / "out_other_seed"
    main([
        "--imagenet-dir", str(src), "--out", str(out),
        "--num-classes", "4", "--images-per-class", "3", "--seed", "7",
    ])
    assert sorted(os.listdir(out)) != picks[0]


def test_selector_nested_mode(tmp_path):
    src = tmp_path / "imagenet"
    out = tmp_path / "nested"
    os.makedirs(src)
    _make_corpus(str(src), n_classes=3, per_class=2)

    main([
        "--imagenet-dir", str(src), "--out", str(out),
        "--num-classes", "2", "--images-per-class", "2", "--nested",
    ])
    sub = sorted(os.listdir(out))
    assert len(sub) == 2
    for cls in sub:
        assert sorted(os.listdir(out / cls))  # images inside class dirs
