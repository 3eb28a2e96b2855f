#!/usr/bin/env python
"""SURVEY §6 parity protocol, executed at reduced scale.

Trains the PyTorch reference stack and this framework on ONE dataset made by
the *reference* generator (seed 42), with an identical reduced schedule, and
reports the PSNR/SSIM delta (PARITY.md).  The reference's own run.py cannot
execute here (albumentations/torchvision/torchmetrics absent), so the torch
side drives the reference's model + loss semantics directly:

  * model: ``/root/reference/models/cdan.py`` imported as-is (the oracle —
    same pattern as tests/test_reference_parity.py);
  * loss: charbonnier(eps=1e-3) + 0.5·(1−SSIM) exactly as
    ``/root/reference/utils/loss_factory.py:161-190`` (SSIM re-implemented
    in torch with torchmetrics defaults: 11×11 gaussian σ=1.5, valid
    windows, auto data range — the same semantics ops/ssim.py is
    golden-tested against);
  * eval: reference test-loop semantics (``models/model.py:247-311``) —
    per-batch metric values averaged over batches;
  * schedule: Adam lr 1e-3 (noise.json), deterministic resize-only
    transform (flip augs dropped on BOTH stacks to cut run-to-run
    variance), identical batch size / epochs.

Run-to-run noise floor: each stack trains with 2 seeds; the between-stack
delta is judged against the within-stack spread.

Usage:
  python tools/parity_protocol.py --workdir /tmp/parity gen
  python tools/parity_protocol.py --workdir /tmp/parity torch --seed 0
  python tools/parity_protocol.py --workdir /tmp/parity jax --seed 0
  python tools/parity_protocol.py --workdir /tmp/parity report
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

REFERENCE = Path("/root/reference")

H, W = 128, 192  # reduced from the task recipe's 256×384
BATCH = 4
EPOCHS = 40
LR = 1e-3  # /root/reference/config/noise.json train.lr
TASK = "noise"


# --------------------------------------------------------------------------- #
# stage: gen — clean images + the reference generator
# --------------------------------------------------------------------------- #


def synth_clean_images(out_dir: Path, n: int = 44, size=(320, 480)) -> None:
    """Deterministic content-rich clean RGB images (shapes over smooth fields)."""
    import cv2

    out_dir.mkdir(parents=True, exist_ok=True)
    rng = np.random.RandomState(1234)
    h, w = size
    for i in range(n):
        base = rng.rand(h // 8, w // 8, 3).astype(np.float32)
        img = cv2.resize(base, (w, h), interpolation=cv2.INTER_CUBIC)
        # gradients
        gx = np.linspace(0, rng.rand(), w, dtype=np.float32)[None, :, None]
        gy = np.linspace(0, rng.rand(), h, dtype=np.float32)[:, None, None]
        img = 0.6 * img + 0.2 * gx + 0.2 * gy
        img8 = np.clip(img * 255, 0, 255).astype(np.uint8)
        for _ in range(12):  # geometric detail
            color = tuple(int(c) for c in rng.randint(0, 255, 3))
            kind = rng.randint(3)
            if kind == 0:
                cv2.circle(img8, (int(rng.randint(w)), int(rng.randint(h))),
                           int(rng.randint(5, 60)), color, -1)
            elif kind == 1:
                x0, y0 = int(rng.randint(w)), int(rng.randint(h))
                cv2.rectangle(img8, (x0, y0),
                              (x0 + int(rng.randint(10, 120)), y0 + int(rng.randint(10, 120))),
                              color, -1)
            else:
                cv2.line(img8, (int(rng.randint(w)), int(rng.randint(h))),
                         (int(rng.randint(w)), int(rng.randint(h))), color,
                         int(rng.randint(1, 6)))
        img8 = cv2.GaussianBlur(img8, (3, 3), 0)
        cv2.imwrite(str(out_dir / f"clean_{i:03d}.png"), img8[:, :, ::-1])
    print(f"[gen] {n} clean images → {out_dir}")


def stage_gen(workdir: Path) -> None:
    synth_clean_images(workdir / "clean_images")
    # Run the reference generator as the dataset oracle (its own seed-42
    # split + degradation draws), pointed at the sandbox via module globals.
    sys.path.insert(0, str(REFERENCE / "datasets_generation"))
    try:
        import generate_paired_degradation_dataset as refgen
    finally:
        sys.path.pop(0)
    refgen.CLEAN_DIR = workdir / "clean_images"
    refgen.OUTPUT_ROOT = workdir / "paired"
    refgen.GENERATE_ALL = False
    refgen.GENERATE = [TASK]
    refgen.main()
    n_train = len(list((workdir / "paired" / TASK / "train" / "clean").glob("*.png")))
    n_test = len(list((workdir / "paired" / TASK / "test" / "clean").glob("*.png")))
    print(f"[gen] reference generator: train={n_train} test={n_test}")


# --------------------------------------------------------------------------- #
# shared: data loading (deterministic resize-only transform)
# --------------------------------------------------------------------------- #


def load_split(workdir: Path, split: str):
    import cv2

    base = workdir / "paired" / TASK / split
    names = sorted(p.name for p in (base / "degraded").glob("*.png"))
    xs, ys = [], []
    for name in names:
        deg = cv2.imread(str(base / "degraded" / name))[:, :, ::-1]
        cln = cv2.imread(str(base / "clean" / name))[:, :, ::-1]
        deg = cv2.resize(deg, (W, H), interpolation=cv2.INTER_LINEAR)
        cln = cv2.resize(cln, (W, H), interpolation=cv2.INTER_LINEAR)
        xs.append(deg.astype(np.float32) / 255.0)
        ys.append(cln.astype(np.float32) / 255.0)
    return np.stack(xs), np.stack(ys)  # NHWC [0,1]


# --------------------------------------------------------------------------- #
# torch-side metrics with torchmetrics default semantics
# --------------------------------------------------------------------------- #


def torch_ssim(preds, target, kernel_size=11, sigma=1.5):
    """SSIM, torchmetrics defaults: gaussian window, valid mode, auto range."""
    import torch
    import torch.nn.functional as F

    dr = torch.maximum(preds.max() - preds.min(), target.max() - target.min())
    x = torch.arange(kernel_size, dtype=preds.dtype, device=preds.device)
    x = x - (kernel_size - 1) / 2.0
    g = torch.exp(-(x * x) / (2 * sigma * sigma))
    g = g / g.sum()
    c = preds.shape[1]
    kh = g.view(1, 1, -1, 1).repeat(c, 1, 1, 1)
    kw = g.view(1, 1, 1, -1).repeat(c, 1, 1, 1)

    def filt(z):
        z = F.conv2d(z, kh, groups=c)
        return F.conv2d(z, kw, groups=c)

    mu_x, mu_y = filt(preds), filt(target)
    mu_xx, mu_yy, mu_xy = filt(preds * preds), filt(target * target), filt(preds * target)
    sx = mu_xx - mu_x * mu_x
    sy = mu_yy - mu_y * mu_y
    sxy = mu_xy - mu_x * mu_y
    c1 = (0.01 * dr) ** 2
    c2 = (0.03 * dr) ** 2
    num = (2 * mu_x * mu_y + c1) * (2 * sxy + c2)
    den = (mu_x**2 + mu_y**2 + c1) * (sx + sy + c2)
    return (num / den).mean()


def torch_psnr(preds, target):
    import torch

    dr = torch.maximum(preds.max() - preds.min(), target.max() - target.min())
    mse = torch.mean((preds - target) ** 2)
    return 10.0 * torch.log10(dr * dr / mse)


# --------------------------------------------------------------------------- #
# stage: torch — train + eval the reference stack
# --------------------------------------------------------------------------- #


def stage_torch(workdir: Path, seed: int) -> None:
    import torch

    torch.manual_seed(seed)
    np.random.seed(seed)
    sys.path.insert(0, str(REFERENCE))
    try:
        from models.cdan import CDAN as TorchCDAN
    finally:
        sys.path.remove(str(REFERENCE))

    xs, ys = load_split(workdir, "train")
    xt, yt = load_split(workdir, "test")
    xs_t = torch.from_numpy(xs.transpose(0, 3, 1, 2))
    ys_t = torch.from_numpy(ys.transpose(0, 3, 1, 2))

    net = TorchCDAN()
    opt = torch.optim.Adam(net.parameters(), lr=LR)
    eps = 1e-3
    n = xs.shape[0]
    gen = torch.Generator().manual_seed(seed)

    t0 = time.time()
    for epoch in range(EPOCHS):
        net.train()
        perm = torch.randperm(n, generator=gen)
        tot = 0.0
        for i in range(0, n - n % BATCH, BATCH):
            idx = perm[i : i + BATCH]
            xb, yb = xs_t[idx], ys_t[idx]
            out = net(xb)
            diff = out - yb
            loss = torch.mean(torch.sqrt(diff * diff + eps * eps))
            loss = loss + 0.5 * (1.0 - torch_ssim(out, yb))
            opt.zero_grad()
            loss.backward()
            opt.step()
            tot += float(loss)
        print(f"[torch seed={seed}] epoch {epoch+1}/{EPOCHS} "
              f"loss={tot / (n // BATCH):.4f} ({time.time()-t0:.0f}s)", flush=True)

    # reference test-loop semantics: per-batch metrics, mean over batches
    net.eval()
    psnrs, ssims, pre_psnrs, pre_ssims = [], [], [], []
    with torch.no_grad():
        for i in range(0, xt.shape[0], BATCH):
            xb = torch.from_numpy(xt[i : i + BATCH].transpose(0, 3, 1, 2))
            yb = torch.from_numpy(yt[i : i + BATCH].transpose(0, 3, 1, 2))
            out = net(xb)
            psnrs.append(float(torch_psnr(out, yb)))
            ssims.append(float(torch_ssim(out, yb)))
            pre_psnrs.append(float(torch_psnr(xb, yb)))
            pre_ssims.append(float(torch_ssim(xb, yb)))
    res = {
        "stack": "torch_reference",
        "seed": seed,
        "epochs": EPOCHS,
        "psnr": float(np.mean(psnrs)),
        "ssim": float(np.mean(ssims)),
        "input_psnr": float(np.mean(pre_psnrs)),
        "input_ssim": float(np.mean(pre_ssims)),
        "train_seconds": time.time() - t0,
    }
    out_path = workdir / f"torch_seed{seed}.json"
    out_path.write_text(json.dumps(res, indent=2))
    print(f"[torch seed={seed}] {res}")


# --------------------------------------------------------------------------- #
# stage: jax — train + eval this framework through its CLI engine
# --------------------------------------------------------------------------- #


def make_config(workdir: Path, seed: int) -> dict:
    d = workdir / "paired" / TASK
    transform = {
        "backend": "albumentations",
        "ops": [
            {"name": "Resize", "args": {"height": H, "width": W}},
            {"name": "Normalize", "args": {"mean": [0, 0, 0], "std": [1, 1, 1]}},
            {"name": "ToTensorV2", "args": {}},
        ],
    }
    run_root = workdir / f"jax_seed{seed}"
    return {
        "name": TASK,
        "task": TASK,
        "model": {
            "which_model": {"name": ["models.model", "Model"], "args": {}},
            "networks": [{"name": ["models.cdan", "CDAN"], "args": {}}],
        },
        "loss": {"enabled": True, "terms": [
            {"name": "charbonnier", "weight": 1.0, "args": {"eps": 1e-3}},
            {"name": "ssim", "weight": 0.5},
        ]},
        "metrics": {"enabled": True, "items": [{"name": "psnr"}, {"name": "ssim"}]},
        "evaluation": {"raw": True, "postprocessed": False},
        "post_processing": {"enabled": False, "ops": []},
        "save_outputs": {"enabled": False},
        "logging": {
            "enabled": True,
            "root_dir": str(run_root / "runs"),
            "train": {"log_every_n_batches": 0, "save_csv": True, "save_jsonl": True},
            "test": {"save_csv": True, "save_jsonl": True},
            "checkpoints": {"enabled": False},
        },
        "train": {
            "n_epoch": EPOCHS,
            "lr": LR,
            "seed": seed,
            "precision": "fp32",
            "dataset": {
                "name": ["data.dataset", "PairedDataset"],
                "args": {
                    "input_root": str(d / "train" / "degraded"),
                    "target_root": str(d / "train" / "clean"),
                    "pairing_mode": "filename",
                    "transform": transform,
                },
            },
            "dataloader": {"args": {"batch_size": BATCH, "shuffle": True,
                                    "num_workers": 0, "drop_last": True}},
            "model_path": str(run_root / "weights") + "/",
            "model_name": f"CDAN_{TASK}.pt",
        },
        "test": {
            "dataset": {
                "name": ["data.dataset", "PairedDataset"],
                "args": {
                    "input_root": str(d / "test" / "degraded"),
                    "target_root": str(d / "test" / "clean"),
                    "pairing_mode": "filename",
                    "transform": transform,
                },
                "is_paired": True,
            },
            "dataloader": {"args": {"batch_size": BATCH, "shuffle": False,
                                    "num_workers": 0}},
            "model_path": str(run_root / "weights") + "/",
            "model_name": f"CDAN_{TASK}.pt",
            "output_images_path": str(run_root / "outputs") + "/",
        },
    }


def stage_jax(workdir: Path, seed: int) -> None:
    import run as run_cli
    from multi_degradation_image_enhancement_tpu.utils.config import load_config

    cfg_path = workdir / f"jax_seed{seed}.json"
    cfg_path.write_text(json.dumps(make_config(workdir, seed)))
    t0 = time.time()
    run_cli.main(load_config(str(cfg_path), phase="train"))
    train_s = time.time() - t0
    run_cli.main(load_config(str(cfg_path), phase="test"))

    # read the test metrics back from the LAST run dir's test.jsonl
    runs = sorted((workdir / f"jax_seed{seed}" / "runs" / TASK).iterdir())
    rows = [json.loads(line) for line in (runs[-1] / "test.jsonl").read_text().splitlines()]
    pre = next(r for r in rows if r.get("stage") == "pre")
    res = {
        "stack": "jax_tpu",
        "seed": seed,
        "epochs": EPOCHS,
        "psnr": pre["metric_psnr"],
        "ssim": pre["metric_ssim"],
        "train_seconds": train_s,
    }
    (workdir / f"jax_seed{seed}.json").write_text(json.dumps(res, indent=2))
    print(f"[jax seed={seed}] {res}")


# --------------------------------------------------------------------------- #
# stage: report
# --------------------------------------------------------------------------- #


def stage_report(workdir: Path) -> None:
    torch_runs = [json.loads(p.read_text()) for p in sorted(workdir.glob("torch_seed*.json"))]
    jax_runs = [json.loads(p.read_text()) for p in sorted(workdir.glob("jax_seed*.json"))]
    if not torch_runs or not jax_runs:
        raise SystemExit("missing results; run the torch/jax stages first")

    def stats(runs, key):
        vals = [r[key] for r in runs]
        return float(np.mean(vals)), (max(vals) - min(vals))

    tp, tps = stats(torch_runs, "psnr")
    jp, jps = stats(jax_runs, "psnr")
    ts, tss = stats(torch_runs, "ssim")
    js, jss = stats(jax_runs, "ssim")
    report = {
        "torch": {"psnr": tp, "psnr_spread": tps, "ssim": ts, "ssim_spread": tss,
                  "runs": torch_runs},
        "jax": {"psnr": jp, "psnr_spread": jps, "ssim": js, "ssim_spread": jss,
                "runs": jax_runs},
        "delta_psnr": jp - tp,
        "delta_ssim": js - ts,
    }
    (workdir / "parity_report.json").write_text(json.dumps(report, indent=2))
    print(json.dumps(report, indent=2))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("stage", choices=["gen", "torch", "jax", "report"])
    ap.add_argument("--workdir", default="/tmp/parity")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    workdir = Path(args.workdir)
    workdir.mkdir(parents=True, exist_ok=True)
    if args.stage == "gen":
        stage_gen(workdir)
    elif args.stage == "torch":
        stage_torch(workdir, args.seed)
    elif args.stage == "jax":
        stage_jax(workdir, args.seed)
    else:
        stage_report(workdir)


if __name__ == "__main__":
    main()
