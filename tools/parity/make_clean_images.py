"""Procedural clean-image corpus for the parity protocol.

The reference pipeline starts from ImageNet-derived clean images
(``datasets_generation/select_clean_images_imagenet.py`` in /root/reference);
this container has no ImageNet, so the parity corpus is generated: seeded
natural-ish compositions (low-frequency color fields + geometric occluders +
mild texture) with enough structure that denoising is learnable.  Both
stacks consume the *same* PNGs, so the corpus choice cancels out of the
parity delta.
"""

from __future__ import annotations

import os

import numpy as np
from PIL import Image, ImageDraw


def _lowfreq_field(rng: np.random.Generator, h: int, w: int) -> np.ndarray:
    """Smooth RGB base: bilinear-upsampled random coarse grid."""
    gh, gw = rng.integers(3, 7), rng.integers(3, 9)
    grid = rng.uniform(0.15, 0.85, size=(gh, gw, 3)).astype(np.float32)
    img = Image.fromarray((grid * 255).astype(np.uint8), "RGB").resize(
        (w, h), Image.BILINEAR
    )
    return np.asarray(img, np.float32) / 255.0


def make_image(rng: np.random.Generator, h: int = 256, w: int = 384) -> np.ndarray:
    base = _lowfreq_field(rng, h, w)
    pil = Image.fromarray((base * 255).astype(np.uint8), "RGB")
    draw = ImageDraw.Draw(pil)
    for _ in range(int(rng.integers(6, 16))):
        color = tuple(int(c) for c in rng.integers(0, 256, size=3))
        x0, y0 = rng.integers(0, w - 8), rng.integers(0, h - 8)
        x1 = x0 + int(rng.integers(8, w // 2))
        y1 = y0 + int(rng.integers(8, h // 2))
        shape = rng.integers(0, 3)
        if shape == 0:
            draw.rectangle([x0, y0, x1, y1], fill=color)
        elif shape == 1:
            draw.ellipse([x0, y0, x1, y1], fill=color)
        else:
            draw.line([x0, y0, x1, y1], fill=color, width=int(rng.integers(2, 9)))
    out = np.asarray(pil, np.float32) / 255.0
    # mild texture so the image isn't piecewise-constant
    texture = rng.normal(0.0, 0.015, size=(h, w, 1)).astype(np.float32)
    out = np.clip(out + texture, 0.0, 1.0)
    return (out * 255.0 + 0.5).astype(np.uint8)


def generate_corpus(out_dir: str, n_images: int, seed: int = 7) -> None:
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    for i in range(n_images):
        img = make_image(rng)
        Image.fromarray(img, "RGB").save(os.path.join(out_dir, f"parity__{i:04d}.png"))


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--n", type=int, default=120)
    ap.add_argument("--seed", type=int, default=7)
    a = ap.parse_args()
    generate_corpus(a.out, a.n, a.seed)
