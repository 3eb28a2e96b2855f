#!/usr/bin/env python
"""Paired per-image evaluation: our trained checkpoint vs the reference's,
both run through OUR engine on the shared parity test split.

The parity headline compares test-set means from two different engines;
with an 18-image test split, a ±0.5 dB gap can be sampling noise.  This
tool removes both confounds for the *checkpoint* comparison: the reference
checkpoint is ported into our format (``tools/port_cdan_checkpoint.py``,
forward parity ≤2e-4, tests/test_reference_parity.py) and both checkpoints
are evaluated per-image by identical code, yielding paired per-image PSNR
deltas, their std, and a paired t-statistic.

Writes ``<workdir>/paired_eval.json``.

Usage (CPU-hermetic; re-execs itself out of the axon site):
  python tools/parity/paired_eval.py --workdir /tmp/parity_r3/motion_blur \
      --task motion_blur
"""

from __future__ import annotations

import argparse
import json
import math
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)


def _maybe_reexec() -> None:
    if (
        "axon_site" in os.environ.get("PYTHONPATH", "")
        and os.environ.get("MDIE_PE_REEXEC") != "1"
    ):
        env = dict(os.environ)
        env["MDIE_PE_REEXEC"] = "1"
        env["PYTHONPATH"] = REPO
        env["JAX_PLATFORMS"] = "cpu"
        os.execve(sys.executable, [sys.executable] + sys.argv, env)


def main() -> None:
    _maybe_reexec()
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--task", default="")
    args = ap.parse_args()
    task = args.task or os.path.basename(args.workdir.rstrip("/"))

    import jax
    import jax.numpy as jnp
    import numpy as np

    from multi_degradation_image_enhancement_tpu.data.loader import define_dataloader
    from multi_degradation_image_enhancement_tpu.engine import checkpoint as ckpt
    from multi_degradation_image_enhancement_tpu.ops.ssim import psnr as psnr_fn
    from multi_degradation_image_enhancement_tpu.ops.ssim import ssim as ssim_fn
    from multi_degradation_image_enhancement_tpu.utils.config import load_config
    from multi_degradation_image_enhancement_tpu.utils.registry import (
        define_dataset,
        define_network,
    )

    cfg_path = os.path.join(args.workdir, f"{task}_parity.json")
    cfg = load_config(cfg_path, phase="test")
    network = define_network(cfg["model"]["networks"][0])
    dataset = define_dataset(cfg["test"]["dataset"])
    loader = define_dataloader(dataset, cfg["test"]["dataloader"]["args"])

    hw = dataset.transform.target_hw or (128, 192)
    dummy = jnp.zeros((1, hw[0], hw[1], 3), jnp.float32)
    variables = network.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)}, dummy, train=False
    )

    ours_path = os.path.join(args.workdir, "ours", "weights", "CDAN_noise_parity.pt")
    ref_pt = os.path.join(args.workdir, "ref", "weights", "CDAN_noise_parity.pt")
    ported = os.path.join(args.workdir, "ref_ported.engine.pt")
    if not os.path.isfile(ported):
        subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "port_cdan_checkpoint.py"),
             "--pt", ref_pt, "--out", ported],
            check=True,
        )

    loads = {}
    for name, path in (("ours", ours_path), ("ref", ported)):
        loaded = ckpt.load_weights(path, variables["params"], variables.get("batch_stats", {}))
        loads[name] = (loaded["params"], loaded["batch_stats"])

    @jax.jit
    def forward(params, batch_stats, x):
        return network.apply(
            {"params": params, "batch_stats": batch_stats}, x, train=False
        )

    per_image = {"ours": [], "ref": []}
    for batch in loader:
        if isinstance(batch, (tuple, list)) and len(batch) == 3:
            inputs, targets, mask = batch
        else:
            (inputs, targets), mask = batch, None
        nv = int(inputs.shape[0]) if mask is None else int(np.sum(np.asarray(mask)))
        for name in ("ours", "ref"):
            out = forward(*loads[name], inputs)
            for i in range(nv):
                o, t = out[i : i + 1], jnp.asarray(targets)[i : i + 1]
                per_image[name].append(
                    {"psnr": float(psnr_fn(o, t)), "ssim": float(ssim_fn(o, t))}
                )

    n = len(per_image["ours"])
    deltas = [a["psnr"] - b["psnr"] for a, b in zip(per_image["ours"], per_image["ref"])]
    mean_d = sum(deltas) / n
    var_d = sum((d - mean_d) ** 2 for d in deltas) / (n - 1)
    se = math.sqrt(var_d / n)
    result = {
        "task": task,
        "n_images": n,
        "ours_psnr_mean": sum(r["psnr"] for r in per_image["ours"]) / n,
        "ref_psnr_mean": sum(r["psnr"] for r in per_image["ref"]) / n,
        "paired_delta_psnr_mean": mean_d,
        "paired_delta_psnr_std": math.sqrt(var_d),
        "paired_delta_se": se,
        "paired_t": mean_d / se if se > 0 else float("inf"),
        "per_image": per_image,
        "deltas": deltas,
        "note": "both checkpoints evaluated by our engine; ref ported via "
        "tools/port_cdan_checkpoint.py (forward parity <=2e-4)",
    }
    out_path = os.path.join(args.workdir, "paired_eval.json")
    with open(out_path, "w") as f:
        json.dump(result, f, indent=2)
    print(
        f"[paired_eval] {task}: ours {result['ours_psnr_mean']:.3f} vs "
        f"ref(ported) {result['ref_psnr_mean']:.3f} dB — paired Δ "
        f"{mean_d:+.3f} ± {se:.3f} (t={result['paired_t']:.2f}, n={n})",
        flush=True,
    )


if __name__ == "__main__":
    main()
