#!/usr/bin/env python
"""Rerun the PyTorch *reference* side of a parity task at extra seeds.

The ours-side seed matrix (``seed_rerun.py``) bounds our trajectory
variance, but the reference headline number is a single seed-42 run — for
tasks where every ours seed loses (color_distortion), the open question is
whether the reference's own per-seed spread covers the gap.  The reference
hardcodes seed 42 (``/root/reference/run.py:9`` →
``utils/reproducibility.py:6``); this wrapper patches the module attribute
*before* importing ``run.py`` (its ``from``-import then binds the patched
function), runs train+test under the parity stubs, and records per-seed
metrics next to the ours-side rerun file:

    results_r3/<task>_ref_seed_rerun.json

Usage:
    python tools/parity/ref_seed_rerun.py --workdir /tmp/parity_r3/color_distortion \
        --task color_distortion --seeds 1337,2024
(The workdir must already hold the parity dataset + config — run
``run_parity.py --stage data`` first.)
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import textwrap

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
HERE = os.path.dirname(os.path.abspath(__file__))
REFERENCE = "/root/reference"
STUBS = os.path.join(HERE, "stubs")
RESULTS = os.path.join(HERE, "results_r3")

sys.path.insert(0, REPO)

from tools.parity.run_parity import extract_metrics  # noqa: E402

# Inline runner executed in the reference's process: patch the seed, then
# dispatch to the reference's own main().
_RUNNER = textwrap.dedent(
    """
    import os, sys
    seed = int(os.environ["REF_SEED"])
    import utils.reproducibility as _rep
    _orig = _rep.set_seed_and_cudnn
    _rep.set_seed_and_cudnn = lambda seed_value=seed: _orig(seed_value)
    sys.argv = ["run.py", "-c", sys.argv[1], "-p", sys.argv[2]]
    import runpy
    runpy.run_path(os.path.join("{ref}", "run.py"), run_name="__main__")
    """
).format(ref=REFERENCE)


def run_ref_seed(workdir: str, task: str, seed: int) -> dict:
    cfg_path = os.path.join(workdir, f"{task}_parity.json")
    if not os.path.isfile(cfg_path):
        raise FileNotFoundError(f"{cfg_path} missing — run run_parity.py --stage data first")
    cwd = os.path.join(workdir, f"ref_seed{seed}")
    os.makedirs(cwd, exist_ok=True)
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYTHONPATH"] = os.pathsep.join([STUBS, REFERENCE])
    env["OMP_NUM_THREADS"] = str(os.cpu_count() or 1)
    env["REF_SEED"] = str(seed)
    for phase in ("train", "test"):
        print(f"[ref-seed] {task} seed={seed}: {phase} ...", flush=True)
        res = subprocess.run(
            [sys.executable, "-c", _RUNNER, cfg_path, phase],
            cwd=cwd, env=env, capture_output=True, text=True,
        )
        sys.stdout.write(res.stdout[-2000:])
        if res.returncode != 0:
            sys.stderr.write(res.stderr[-8000:])
            raise RuntimeError(f"ref seed={seed} {phase} failed (rc={res.returncode})")
    runs = os.path.join(cwd, "runs", f"{task}_parity")
    latest = sorted(os.listdir(runs))[-1]
    m = extract_metrics(os.path.join(runs, latest))
    m["seed"] = seed
    return m


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--task", required=True)
    ap.add_argument("--seeds", default="1337,2024")
    args = ap.parse_args()

    out_path = os.path.join(RESULTS, f"{args.task}_ref_seed_rerun.json")
    runs = []
    if os.path.isfile(out_path):
        with open(out_path) as f:
            runs = json.load(f).get("runs", [])
    done = {r["seed"] for r in runs}

    for seed in [int(s) for s in args.seeds.split(",") if s]:
        if seed in done:
            print(f"[ref-seed] seed {seed} already measured, skipping")
            continue
        m = run_ref_seed(args.workdir, args.task, seed)
        runs.append(m)
        psnrs = [r["psnr"] for r in runs]
        payload = {
            "task": args.task,
            "runs": runs,
            "psnr_mean": sum(psnrs) / len(psnrs),
            "psnr_spread": max(psnrs) - min(psnrs) if len(psnrs) > 1 else 0.0,
        }
        os.makedirs(RESULTS, exist_ok=True)
        with open(out_path, "w") as f:
            json.dump(payload, f, indent=2)
        print(f"[ref-seed] {args.task} seed={seed}: PSNR {m['psnr']:.3f} SSIM {m['ssim']:.4f}")
    print(f"[ref-seed] written {out_path}")


if __name__ == "__main__":
    main()
