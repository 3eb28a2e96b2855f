#!/usr/bin/env python
"""Full-pipeline CLI: classify degradations → route → restore a directory of images.

The end-to-end flow the reference only implies (classifier checkpoint + one
CDAN weight file per degradation; SURVEY.md: routing "exists only
implicitly") — here it's one command:

  python run_pipeline.py --images degraded/ --out restored/ \
      --classifier runs_classifier/run_*/best_model.msgpack \
      --weights-dir weights/ [--mode top1|sequential] [--batch 16]

``--weights-dir`` holds the engine weight files named ``CDAN_<task>.pt``
(as written by training each task config, or ported from the reference via
``tools/port_cdan_checkpoint.py``).  Missing experts are skipped with a
warning — images routed to them pass through unrestored.

Thresholds default to the classifier run's tuned ``thresholds_val.json``
next to the checkpoint when present, else 0.5.

IO is streamed: a producer thread decodes batch i+1 through the native C++
decoder (``native/mdie_io.cpp``, its own thread pool) while batch i runs on
the device, and restored PNGs are encoded/written by a background writer
pool — the device never waits on the filesystem in steady state.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def resolve_thresholds(classes, packaged_path, run_path):
    """Per-class routing thresholds, merged across the priority tiers.

    Priority per class: the classifier run's own tuned ``thresholds_val.json``
    → the packaged defaults tuned on the shipped synthetic quality run
    (``config/classifier_thresholds.json``) → flat 0.5.  Merged per class,
    not replaced per file: a run file that lacks some classes must fall back
    to the packaged defaults for those, not to flat 0.5.

    Returns ``(thresholds_list_in_class_order, source_description)``.
    """
    thr_by_class = {c: 0.5 for c in classes}
    source = "flat 0.5"
    for path in (packaged_path, run_path):
        if path and os.path.exists(path):
            with open(path, encoding="utf-8") as f:
                report = json.load(f)
            found = {c: report["thresholds"][c] for c in classes if c in report["thresholds"]}
            thr_by_class.update(found)
            if found:
                source = path
    return [thr_by_class[c] for c in classes], source


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", required=True, help="directory of degraded images")
    ap.add_argument("--out", required=True, help="output directory for restored PNGs")
    ap.add_argument("--classifier", required=True, help="classifier best_model.msgpack")
    ap.add_argument("--weights-dir", required=True, help="dir with CDAN_<task>.pt files")
    ap.add_argument(
        "--mode", choices=["top1", "sequential"], default="top1",
        help="top1 (default): each image visits its argmax expert only — "
        "use for single-degradation streams (the A/B control ties the two "
        "modes to 0.01 dB there).  sequential: every expert above its "
        "threshold applies in bank order, at up to E× the compute — "
        "measured +2.7 dB mean PSNR on doubly-degraded inputs "
        "(tools/parity/results_r3/seq_routing_ab.json; per-pair deltas "
        "range -10..+14 dB — expert application order matters), so prefer "
        "it when multi-label inputs are expected and throughput allows.")
    ap.add_argument(
        "--ordering", choices=["fixed", "severity", "severity_asc"],
        default="fixed",
        help="sequential-mode expert application order: fixed bank order "
        "(default) or sorted by the classifier severity head (descending "
        "for 'severity' — outermost-degradation-first; 'severity_asc' is "
        "the control direction).  Ignored in top1 mode.")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--input-hw", type=int, nargs=2, default=[256, 384])
    ap.add_argument("--save-probs", action="store_true", help="write probs.jsonl")
    ap.add_argument(
        "--io-threads", type=int, default=4,
        help="native decoder threads and PNG writer pool size",
    )
    ap.add_argument(
        "--expert-mesh", type=int, default=0,
        help="shard the expert bank over this many devices (expert-parallel "
        "serving; must divide the number of loaded experts; 0 = replicate)",
    )
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from multi_degradation_image_enhancement_tpu.classification.model import (
        MultiHeadClassifier,
    )
    from multi_degradation_image_enhancement_tpu.classification.train import load_checkpoint
    from multi_degradation_image_enhancement_tpu.data.dataset import _list_images
    from multi_degradation_image_enhancement_tpu.data.streaming import stream_restore
    from multi_degradation_image_enhancement_tpu.models.cdan import CDAN
    from multi_degradation_image_enhancement_tpu.ops.degradations import DEGRADATIONS
    from multi_degradation_image_enhancement_tpu.pipeline import (
        FullPipeline,
        RoutedRestorer,
        load_expert_bank,
    )

    hw = tuple(args.input_hw)
    dtype = jnp.bfloat16 if jax.default_backend() != "cpu" else jnp.float32

    # ---- classifier ----
    meta_path = args.classifier + ".json"
    classes = list(DEGRADATIONS)
    if os.path.exists(meta_path):
        with open(meta_path, encoding="utf-8") as f:
            classes = json.load(f).get("classes", classes)
    clf = MultiHeadClassifier(num_classes=len(classes), dtype=dtype)
    template = clf.init(
        {"params": jax.random.key(0)}, jnp.zeros((1, hw[0], hw[1], 3), jnp.float32), train=False
    )
    host_template = {
        "params": jax.tree.map(np.asarray, template["params"]),
        "batch_stats": jax.tree.map(np.asarray, template["batch_stats"]),
    }
    clf_vars = load_checkpoint(args.classifier, host_template)

    packaged = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "multi_degradation_image_enhancement_tpu", "config",
        "classifier_thresholds.json",
    )
    thr_path = os.path.join(os.path.dirname(args.classifier), "thresholds_val.json")
    thresholds, thr_source = resolve_thresholds(classes, packaged, thr_path)
    print(f"[pipeline] thresholds: {thr_source}")

    # ---- expert bank ----
    weight_paths = {}
    for name in DEGRADATIONS:
        p = os.path.join(args.weights_dir, f"CDAN_{name}.pt")
        if os.path.isfile(p):
            weight_paths[name] = p
        else:
            print(f"[pipeline] WARNING: no weights for '{name}' ({p}); passthrough")
    if not weight_paths:
        raise FileNotFoundError(f"No CDAN_<task>.pt files in {args.weights_dir}")

    network = CDAN(dtype=dtype)
    expert_names, stacked = load_expert_bank(network, weight_paths, hw)

    mesh = None
    if args.expert_mesh > 1:
        from multi_degradation_image_enhancement_tpu.parallel.mesh import create_mesh

        if len(expert_names) % args.expert_mesh:
            raise ValueError(
                f"--expert-mesh {args.expert_mesh} does not divide the "
                f"{len(expert_names)} loaded experts"
            )
        mesh = create_mesh(
            {"expert": args.expert_mesh}, devices=jax.devices()[: args.expert_mesh]
        )
        print(f"[pipeline] expert bank sharded over {args.expert_mesh} devices")
    router = RoutedRestorer(network, expert_names, stacked, mode=args.mode,
                            mesh=mesh, ordering=args.ordering)
    pipeline = FullPipeline(clf, clf_vars, router, thresholds, classes=classes)

    # ---- run over the directory, streaming (decode-ahead + async writes) ----
    files = _list_images(args.images)
    if not files:
        raise RuntimeError(f"No images in {args.images}")

    def run_batch(imgs_u8):
        x01 = jnp.asarray(imgs_u8, jnp.float32) / 255.0
        restored, probs = pipeline(x01)
        # one D2H per batch; PNG encode happens on the writer pool
        restored = np.clip(np.asarray(restored) * 255.0, 0, 255).astype(np.uint8)
        return restored, np.asarray(probs)

    rows = stream_restore(
        files, args.images, args.out,
        hw=hw, batch=args.batch, run_batch=run_batch, io_threads=args.io_threads,
        progress=lambda done, total: print(f"[pipeline] {done}/{total}"),
    )
    probs_log = [
        {"file": fname, "probs": {n: float(p[k]) for k, n in enumerate(expert_names)}}
        for fname, p in rows
    ]

    if args.save_probs:
        with open(os.path.join(args.out, "probs.jsonl"), "w") as f:
            for row in probs_log:
                f.write(json.dumps(row) + "\n")
    print(f"[OK] restored {len(files)} images -> {args.out}")


if __name__ == "__main__":
    main()
