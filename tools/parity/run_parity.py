#!/usr/bin/env python
"""Execute the SURVEY.md §6 parity protocol at reduced scale.

One shared, reference-generated paired dataset; the SAME JSON config; two
stacks — the PyTorch reference (/root/reference, run via dependency shims in
``tools/parity/stubs``) and this framework — each trained for the same short
schedule and evaluated with identical metric math (PSNR/SSIM, batch-mean of
batch-means).  Writes PARITY.md at the repo root with the deltas.

Protocol (oracle: /root/reference/models/model.py:247-311,
generate_paired_degradation_dataset.py:255-277):
  1. procedural clean corpus (both stacks see the same PNGs)
  2. reference generator → noise/{train,test}/{clean,degraded} (seed 42)
  3. train reference (torch CPU) + test
  4. train ours (JAX CPU — same schedule) + test
  5. report PSNR/SSIM deltas (target: ≤0.05 dB PSNR)

Everything runs on CPU so the TPU stays free for benchmarking; the parity
question is a numbers question, not a speed question.

Usage: python tools/parity/run_parity.py [--workdir /tmp/parity] [--epochs 12]
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
HERE = os.path.dirname(os.path.abspath(__file__))
REFERENCE = "/root/reference"
STUBS = os.path.join(HERE, "stubs")

sys.path.insert(0, REPO)

from tools.parity.make_clean_images import generate_corpus  # noqa: E402


def build_config(data_root: str, epochs: int, batch: int, h: int, w: int, task: str = "noise") -> dict:
    aug = [
        {"name": "HorizontalFlip", "args": {"p": 0.5}},
        {"name": "VerticalFlip", "args": {"p": 0.2}},
        {"name": "RandomRotate90", "args": {"p": 0.15}},
    ]
    tail = [
        {"name": "Resize", "args": {"height": h, "width": w}},
        {"name": "Normalize", "args": {"mean": [0.0, 0.0, 0.0], "std": [1.0, 1.0, 1.0]}},
        {"name": "ToTensorV2", "args": {}},
    ]

    def dataset(split: str, ops):
        return {
            "name": ["data.dataset", "PairedDataset"],
            "args": {
                "input_root": f"{data_root}/{task}/{split}/degraded",
                "target_root": f"{data_root}/{task}/{split}/clean",
                "pairing_mode": "filename",
                "transform": {"backend": "albumentations", "ops": ops},
            },
        }

    return {
        "name": f"{task}_parity",
        "task": f"{task}_parity",
        "phase": "train",
        "model": {
            "which_model": {"name": ["models.model", "Model"], "args": {}},
            "networks": [{"name": ["models.cdan", "CDAN"], "args": {}}],
        },
        "loss": {
            "enabled": True,
            "terms": [
                {"name": "charbonnier", "weight": 1.0, "args": {"eps": 0.001}},
                {"name": "ssim", "weight": 0.5},
            ],
        },
        "metrics": {"enabled": True, "items": [{"name": "psnr"}, {"name": "ssim"}]},
        "evaluation": {"raw": True, "postprocessed": False},
        "post_processing": {"enabled": False, "ops": []},
        "save_outputs": {"enabled": False},
        "logging": {
            "enabled": True,
            "root_dir": "runs",
            "save_config_copy": True,
            "train": {"log_every_n_batches": 0, "save_csv": True, "save_jsonl": True},
            "test": {"save_csv": True, "save_jsonl": True},
            "checkpoints": {"enabled": False, "every_n_epochs": 10},
        },
        "train": {
            "device": "cpu",
            "n_epoch": epochs,
            "lr": 0.001,
            "dataset": dataset("train", aug + tail),
            "dataloader": {"args": {"batch_size": batch, "shuffle": True, "num_workers": 0}},
            "model_path": "weights/",
            "model_name": "CDAN_noise_parity.pt",
        },
        "test": {
            "device": "cpu",
            "dataset": dataset("test", tail),
            "dataloader": {"args": {"batch_size": batch, "shuffle": False, "num_workers": 0}},
            "model_path": "weights/",
            "model_name": "CDAN_noise_parity.pt",
        },
    }


def generate_dataset(workdir: str, task: str = "noise") -> str:
    clean_dir = os.path.join(workdir, "clean_images")
    data_root = os.path.join(workdir, "paired")
    if os.path.isdir(os.path.join(data_root, task)):
        print("[parity] dataset exists, skipping generation")
        return data_root
    generate_corpus(clean_dir, n_images=120, seed=7)

    # Run the reference generator in-process with its module config pointed
    # at our corpus (the reference exposes generation choices as module
    # globals — generate_paired_degradation_dataset.py:19-50).
    from pathlib import Path

    spec = importlib.util.spec_from_file_location(
        "ref_paired_gen",
        os.path.join(REFERENCE, "datasets_generation", "generate_paired_degradation_dataset.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.CLEAN_DIR = Path(clean_dir)
    mod.OUTPUT_ROOT = Path(data_root)
    mod.GENERATE_ALL = False
    mod.GENERATE = [task]
    mod.OVERWRITE_EXISTING = True
    mod.main()
    return data_root


def run_stack(label: str, runner: str, cwd: str, cfg_path: str, env: dict, task: str = "noise") -> str:
    os.makedirs(cwd, exist_ok=True)
    for phase in ("train", "test"):
        print(f"[parity] {label}: {phase} ...", flush=True)
        res = subprocess.run(
            [sys.executable, runner, "-c", cfg_path, "-p", phase],
            cwd=cwd,
            env=env,
            capture_output=True,
            text=True,
        )
        sys.stdout.write(res.stdout[-4000:])
        if res.returncode != 0:
            sys.stderr.write(res.stderr[-8000:])
            raise RuntimeError(f"{label} {phase} failed (rc={res.returncode})")
    # newest run dir (the test phase's) — metrics live in its test.jsonl
    runs = os.path.join(cwd, "runs", f"{task}_parity")
    latest = sorted(os.listdir(runs))[-1]
    return os.path.join(runs, latest)


def extract_metrics(run_dir: str) -> dict:
    """Read the [PRE] paired-test row both stacks log to test.jsonl
    ({"type": "test", "stage": "pre", "metric_psnr": ..., "metric_ssim": ...} —
    /root/reference/models/model.py:315-322 and our engine mirror)."""
    path = os.path.join(run_dir, "test.jsonl")
    with open(path) as f:
        rows = [json.loads(line) for line in f if line.strip()]
    for row in rows:
        if row.get("stage") == "pre" and "metric_psnr" in row:
            return {"psnr": float(row["metric_psnr"]), "ssim": float(row["metric_ssim"])}
    raise RuntimeError(f"no pre-stage metric row in {path}: {rows[:3]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/parity")
    ap.add_argument("--epochs", type=int, default=12)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--height", type=int, default=128)
    ap.add_argument("--width", type=int, default=192)
    ap.add_argument("--task", default="noise", help="reference degradation to test")
    ap.add_argument("--fresh", action="store_true")
    ap.add_argument(
        "--stage", default="all", choices=["all", "data", "ref", "ours", "report"],
        help="run one protocol stage (for background orchestration on a 1-CPU host: "
        "the torch ref side queues on the CPU while the ours side runs separately)",
    )
    ap.add_argument(
        "--ours-tpu", action="store_true",
        help="run the ours side on the default JAX backend (TPU) instead of forcing CPU",
    )
    ap.add_argument(
        "--fused-dense", action="store_true",
        help="set train.fused_dense in the generated config (ours-only knob —"
        " the torch reference ignores unknown train keys); for fused-training"
        " quality A/Bs",
    )
    args = ap.parse_args()

    if args.fresh and os.path.isdir(args.workdir):
        shutil.rmtree(args.workdir)
    os.makedirs(args.workdir, exist_ok=True)

    data_root = generate_dataset(args.workdir, args.task)
    cfg = build_config(data_root, args.epochs, args.batch, args.height, args.width, args.task)
    if args.fused_dense:
        cfg["train"]["fused_dense"] = True
    cfg_path = os.path.join(args.workdir, f"{args.task}_parity.json")
    with open(cfg_path, "w") as f:
        json.dump(cfg, f, indent=2)
    if args.stage == "data":
        return

    base_env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}

    def _mark(name: str, run_dir: str) -> None:
        with open(os.path.join(args.workdir, f"{name}_run.json"), "w") as f:
            json.dump({"run_dir": run_dir}, f)

    def _load_mark(name: str) -> str:
        with open(os.path.join(args.workdir, f"{name}_run.json")) as f:
            return json.load(f)["run_dir"]

    ref_run = None
    if args.stage in ("all", "ref"):
        # --- reference (torch CPU, dependency shims) ---
        ref_env = dict(base_env)
        ref_env["PYTHONPATH"] = os.pathsep.join([STUBS, REFERENCE])
        ref_env["OMP_NUM_THREADS"] = str(os.cpu_count() or 8)
        ref_run = run_stack(
            "reference", os.path.join(REFERENCE, "run.py"),
            os.path.join(args.workdir, "ref"), cfg_path, ref_env, args.task,
        )
        _mark("ref", ref_run)
        if args.stage == "ref":
            return

    our_run = None
    if args.stage in ("all", "ours"):
        # --- ours (JAX CPU by default; strip the axon TPU site so
        # JAX_PLATFORMS sticks.  --ours-tpu keeps the production backend.) ---
        our_env = dict(base_env)
        if args.ours_tpu:
            our_env["PYTHONPATH"] = os.environ.get("PYTHONPATH", "")
        else:
            our_env["PYTHONPATH"] = os.pathsep.join(
                [p for p in os.environ.get("PYTHONPATH", "").split(os.pathsep) if "axon" not in p]
            )
            our_env["JAX_PLATFORMS"] = "cpu"
        our_run = run_stack(
            "ours", os.path.join(REPO, "run.py"),
            os.path.join(args.workdir, "ours"), cfg_path, our_env, args.task,
        )
        _mark("ours", our_run)
        if args.stage == "ours":
            return

    ref_run = ref_run or _load_mark("ref")
    our_run = our_run or _load_mark("ours")
    ref_m = extract_metrics(ref_run)
    our_m = extract_metrics(our_run)
    result = {
        "reference": ref_m,
        "ours": our_m,
        "delta_psnr_db": our_m["psnr"] - ref_m["psnr"],
        "delta_ssim": our_m["ssim"] - ref_m["ssim"],
        "task": args.task,
        "epochs": args.epochs,
        "resolution": [args.height, args.width],
        "batch": args.batch,
    }
    print(json.dumps(result, indent=2))
    with open(os.path.join(args.workdir, "parity_result.json"), "w") as f:
        json.dump(
            {**result, "ref_run": ref_run, "our_run": our_run}, f, indent=2
        )


if __name__ == "__main__":
    main()
