#!/usr/bin/env python
"""Multi-label degradation classifier: train / tune / test / diagnostics CLI.

CLI and behavior parity with the reference workload
(``classification/train_multilabel_classifier.py`` — SURVEY.md §2 C16):

  * flags ``--train --tune_thresh --test --diagnostics`` (all four default on
    when none given), plus dataset/run-dir/checkpoint/epochs/batch/lr/
    patience/threshold-grid knobs;
  * ResNet-18 backbone + class/severity heads; loss =
    pos-weighted BCE + 0.5·SmoothL1(sigmoid(sev)) masked to positive labels;
  * early stopping on val F1-micro with patience 6; best checkpoint stores
    weights + classes + normalization metadata;
  * per-class threshold grid search 0.05–0.95 on VAL;
  * diagnostics: PR/AP, score histograms, top-K FP/FN exports with full
    label vectors and co-occurrence JSONs;
  * ``training.log`` stdout tee, ``history.json`` + curve PNGs,
    ``summary.json``.

TPU-first: the whole step (forward+loss+backward+Adam+BN) is one jitted
function; augs/normalization run batched on device (``classification.data``).

Usage:
  python -m multi_degradation_image_enhancement_tpu.classification.train \
      --dataset_root classifier_dataset --train --tune_thresh --test --diagnostics
"""

from __future__ import annotations

import argparse
from types import SimpleNamespace
import json
import os
import sys
import time
from datetime import datetime
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import serialization

from multi_degradation_image_enhancement_tpu.classification import metrics as M
from multi_degradation_image_enhancement_tpu.classification.data import (
    ClassifierLoader,
    MultiLabelSeverityDataset,
    read_jsonl,
)
from multi_degradation_image_enhancement_tpu.classification.diagnostics import run_diagnostics
from multi_degradation_image_enhancement_tpu.classification.model import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    MultiHeadClassifier,
    init_classifier_variables,
)
from multi_degradation_image_enhancement_tpu.engine.state import TrainState

LAMBDA_SEVERITY = 0.5


class TeeLogger:
    """stdout tee into training.log (reference ``:54-66``)."""

    def __init__(self, file_path: str):
        self.terminal = sys.stdout
        self.log = open(file_path, "a", encoding="utf-8")

    def write(self, message: str):
        self.terminal.write(message)
        self.log.write(message)
        self.log.flush()

    def flush(self):
        self.terminal.flush()
        self.log.flush()


def _losses(cls_logits, sev_logits, y, s, pos_weight):
    bce = -(
        pos_weight * y * jax.nn.log_sigmoid(cls_logits)
        + (1.0 - y) * jax.nn.log_sigmoid(-cls_logits)
    )
    loss_cls = jnp.mean(bce)
    sev_pred = jax.nn.sigmoid(sev_logits)
    d = sev_pred - s
    huber = jnp.where(jnp.abs(d) < 1.0, 0.5 * d * d, jnp.abs(d) - 0.5)
    mask = (y > 0.5).astype(jnp.float32)
    denom = jnp.maximum(jnp.sum(mask), 1.0)
    loss_sev = jnp.where(jnp.sum(mask) > 0, jnp.sum(huber * mask) / denom, 0.0)
    return loss_cls, loss_sev, sev_pred


def build_steps(model: MultiHeadClassifier, pos_weight: jnp.ndarray):
    @jax.jit
    def eval_step(params, batch_stats, x, y, s):
        cls_logits, sev_logits = model.apply(
            {"params": params, "batch_stats": batch_stats}, x, train=False
        )
        loss_cls, loss_sev, sev_pred = _losses(cls_logits, sev_logits, y, s, pos_weight)
        return {
            "loss_cls": loss_cls,
            "loss_sev": loss_sev,
            "probs": jax.nn.sigmoid(cls_logits),
            "sev_pred": sev_pred,
        }

    def train_step(state: TrainState, x, y, s):
        def loss_fn(params):
            (cls_logits, sev_logits), mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                x, train=True, mutable=["batch_stats"],
            )
            loss_cls, loss_sev, sev_pred = _losses(cls_logits, sev_logits, y, s, pos_weight)
            loss = loss_cls + LAMBDA_SEVERITY * loss_sev
            aux = {
                "loss_cls": loss_cls,
                "loss_sev": loss_sev,
                "probs": jax.nn.sigmoid(cls_logits),
                "sev_pred": sev_pred,
                "mutated": mutated,
            }
            return loss, aux

        (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads).replace(
            batch_stats=aux["mutated"]["batch_stats"]
        )
        return new_state, {k: v for k, v in aux.items() if k != "mutated"}

    return jax.jit(train_step, donate_argnums=(0,)), eval_step


def run_epoch(
    loader: ClassifierLoader,
    classes: List[str],
    thresholds: List[float],
    *,
    train: bool,
    state: Optional[TrainState] = None,
    params=None,
    batch_stats=None,
    train_step=None,
    eval_step=None,
) -> Tuple[Dict, Optional[TrainState], Dict[str, np.ndarray]]:
    """One pass over a split; returns (metrics, new_state, collected arrays)."""
    tot_cls, tot_sev, n_batches = 0.0, 0.0, 0
    all_p, all_y, all_st, all_sp, all_paths = [], [], [], [], []

    for x, y, s, paths in loader:
        if train:
            state, aux = train_step(state, x, y, s)
        else:
            aux = eval_step(params, batch_stats, x, y, s)
        out = jax.device_get({k: aux[k] for k in ("loss_cls", "loss_sev", "probs", "sev_pred")})
        tot_cls += float(out["loss_cls"])
        tot_sev += float(out["loss_sev"])
        n_batches += 1
        all_p.append(out["probs"])
        all_y.append(np.asarray(y))
        all_st.append(np.asarray(s))
        all_sp.append(out["sev_pred"])
        all_paths.extend(paths)

    nC = len(classes)
    probs = np.concatenate(all_p) if all_p else np.zeros((0, nC), np.float32)
    y_true = np.concatenate(all_y) if all_y else np.zeros((0, nC), np.float32)
    s_true = np.concatenate(all_st) if all_st else np.zeros((0, nC), np.float32)
    s_pred = np.concatenate(all_sp) if all_sp else np.zeros((0, nC), np.float32)

    y_hat = M.apply_thresholds(probs, thresholds)
    f1_micro, f1_macro = M.f1_micro_macro(y_true, y_hat)
    nb = max(1, n_batches)
    metrics = {
        "loss": (tot_cls + LAMBDA_SEVERITY * tot_sev) / nb,
        "loss_cls": tot_cls / nb,
        "loss_sev": tot_sev / nb,
        "f1_micro": f1_micro,
        "f1_macro": f1_macro,
        "sev_mae": M.severity_mae(y_true, s_true, s_pred),
        "f1_by_class": M.per_class_f1(y_true, y_hat, classes),
    }
    collected = {
        "probs": probs, "y_true": y_true, "s_true": s_true, "s_pred": s_pred,
        "paths": all_paths,
    }
    return metrics, state, collected


def _plot_curve(run_dir: str, y1, y2, title: str, ylabel: str, name: str):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    plt.figure()
    plt.plot(y1, label="train")
    plt.plot(y2, label="val")
    plt.title(title)
    plt.xlabel("epoch")
    plt.ylabel(ylabel)
    plt.legend()
    plt.tight_layout()
    plt.savefig(os.path.join(run_dir, name))
    plt.close()


def save_checkpoint(path: str, state: TrainState, meta: Dict) -> None:
    payload = {
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
    }
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(payload))
    with open(path + ".json", "w", encoding="utf-8") as f:
        json.dump(meta, f, indent=2)


def load_checkpoint(path: str, template: Dict) -> Dict:
    """``template`` must be a host-side {params, batch_stats} shape tree —
    the live variables may have been donated into the train state."""
    with open(path, "rb") as f:
        data = f.read()
    return serialization.from_bytes(template, data)


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--dataset_root", type=str, default="classifier_dataset")
    p.add_argument("--run_base", type=str, default="runs_classifier")
    p.add_argument("--run_dir", type=str, default="")
    p.add_argument("--checkpoint", type=str, default="")
    p.add_argument("--train", action="store_true")
    p.add_argument("--tune_thresh", action="store_true")
    p.add_argument("--test", action="store_true")
    p.add_argument("--diagnostics", action="store_true")
    p.add_argument("--th_min", type=float, default=0.05)
    p.add_argument("--th_max", type=float, default=0.95)
    p.add_argument("--th_steps", type=int, default=19)
    p.add_argument("--epochs", type=int, default=30)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--patience", type=int, default=6)
    p.add_argument("--num_workers", type=int, default=4)
    p.add_argument("--no_normalize", action="store_true")
    p.add_argument("--bn_recal_passes", type=int, default=0,
                   help="post-training BN stats re-estimation passes over the "
                        "train split (adopted only if val F1 does not degrade)")
    p.add_argument("--no_pretrained", action="store_true")
    p.add_argument("--diag_topk", type=int, default=24)
    p.add_argument("--input_hw", type=int, nargs=2, default=[256, 384])
    p.add_argument("--synthetic", action="store_true",
                   help="train on on-device synthesized degradations (no disk dataset)")
    p.add_argument("--synthetic_images", type=int, default=256)
    p.add_argument("--synthetic_variants", type=int, default=2)
    p.add_argument("--clean_root", type=str, default="",
                   help="clean images for --synthetic (procedural if empty)")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    dataset_root = args.dataset_root

    os.makedirs(args.run_base, exist_ok=True)
    run_dir = args.run_dir or os.path.join(
        args.run_base, datetime.now().strftime("run_%Y-%m-%d_%H-%M-%S")
    )
    os.makedirs(run_dir, exist_ok=True)

    log_path = os.path.join(run_dir, "training.log")
    sys.stdout = TeeLogger(log_path)
    print(f"Logging -> {log_path}")
    print("Backend:", jax.default_backend())
    print("Dataset root:", os.path.abspath(dataset_root))
    print("Run dir:", os.path.abspath(run_dir))

    if not (args.train or args.tune_thresh or args.test or args.diagnostics):
        args.train = args.tune_thresh = args.test = args.diagnostics = True

    input_hw = tuple(args.input_hw)
    normalize = not args.no_normalize
    if normalize:
        print(f"Using ImageNet normalization: mean={IMAGENET_MEAN} std={IMAGENET_STD}")

    if args.synthetic:
        from multi_degradation_image_enhancement_tpu.classification.synthetic import (
            SyntheticClassifierDataset,
            SyntheticClassifierLoader,
        )
        from multi_degradation_image_enhancement_tpu.ops.degradations import DEGRADATIONS

        classes = list(DEGRADATIONS)
        print("Classes (synthetic):", classes)

        def mk_loader(split, shuffle, augment):
            n = args.synthetic_images if split == "train" else max(16, args.synthetic_images // 4)
            ds = SyntheticClassifierDataset(
                split=split, clean_root=args.clean_root or None, n_images=n,
                variants_per_image=args.synthetic_variants, input_hw=input_hw,
            )
            return SyntheticClassifierLoader(
                ds, batch_size=args.batch_size, shuffle=shuffle,
                augment=augment, normalize=normalize,
            )
    else:
        with open(os.path.join(dataset_root, "meta", "classes.json"), encoding="utf-8") as f:
            classes = json.load(f)
        print("Classes:", classes)

        def mk_loader(split, shuffle, augment):
            return ClassifierLoader(
                MultiLabelSeverityDataset(dataset_root, split, classes, input_hw),
                batch_size=args.batch_size, shuffle=shuffle, augment=augment,
                normalize=normalize, num_workers=args.num_workers,
            )

    num_classes = len(classes)
    train_loader = mk_loader("train", True, True)
    val_loader = mk_loader("val", False, False)
    test_loader = mk_loader("test", False, False)
    print(
        f"Dataset sizes: train={len(train_loader.dataset)} | "
        f"val={len(val_loader.dataset)} | test={len(test_loader.dataset)}"
    )

    model = MultiHeadClassifier(num_classes=num_classes)
    variables = init_classifier_variables(
        model, input_hw, pretrained_backbone=not args.no_pretrained
    )

    if args.synthetic:
        train_rows = train_loader.dataset.labels_rows()
    else:
        train_rows = read_jsonl(os.path.join(dataset_root, "train", "labels.jsonl"))
    pos_weight = jnp.asarray(M.compute_pos_weight(train_rows, classes))
    print("pos_weight:", np.asarray(pos_weight).tolist())

    # host-side shape template (the live variables get donated into state)
    var_template = {
        "params": jax.tree.map(lambda x: np.zeros(x.shape, x.dtype), variables["params"]),
        "batch_stats": jax.tree.map(
            lambda x: np.zeros(x.shape, x.dtype), variables["batch_stats"]
        ),
    }

    train_step, eval_step = build_steps(model, pos_weight)
    state = TrainState.create(
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        tx=optax.adam(args.lr),
    )

    thresholds = [M.DEFAULT_THRESH] * num_classes
    best_path = os.path.join(run_dir, "best_model.msgpack")

    if args.train:
        best_score, patience = -1.0, 0
        history = {k: [] for k in (
            "train_loss", "val_loss", "train_f1micro", "val_f1micro",
            "train_f1macro", "val_f1macro", "train_sev_mae", "val_sev_mae",
        )}
        t0 = time.time()
        for epoch in range(1, args.epochs + 1):
            print(f"\n===== EPOCH {epoch}/{args.epochs} =====")
            e0 = time.time()
            tr, state, _ = run_epoch(
                train_loader, classes, thresholds, train=True, state=state,
                train_step=train_step,
            )
            va, _, _ = run_epoch(
                val_loader, classes, thresholds, train=False,
                params=state.params, batch_stats=state.batch_stats, eval_step=eval_step,
            )
            print(
                f"Train loss={tr['loss']:.4f} (cls={tr['loss_cls']:.4f}, sev={tr['loss_sev']:.4f}) | "
                f"F1micro={tr['f1_micro']:.4f} F1macro={tr['f1_macro']:.4f} | sevMAE={tr['sev_mae']:.4f}"
            )
            print(
                f"Val   loss={va['loss']:.4f} (cls={va['loss_cls']:.4f}, sev={va['loss_sev']:.4f}) | "
                f"F1micro={va['f1_micro']:.4f} F1macro={va['f1_macro']:.4f} | sevMAE={va['sev_mae']:.4f}"
            )
            print(f"epoch time: {time.time()-e0:.1f}s")

            with open(os.path.join(run_dir, "per_class_f1_val.json"), "w") as f:
                json.dump(va["f1_by_class"], f, indent=2)

            for k, v in (
                ("train_loss", tr["loss"]), ("val_loss", va["loss"]),
                ("train_f1micro", tr["f1_micro"]), ("val_f1micro", va["f1_micro"]),
                ("train_f1macro", tr["f1_macro"]), ("val_f1macro", va["f1_macro"]),
                ("train_sev_mae", tr["sev_mae"]), ("val_sev_mae", va["sev_mae"]),
            ):
                history[k].append(v)

            if va["f1_micro"] > best_score:
                best_score = va["f1_micro"]
                patience = 0
                save_checkpoint(
                    best_path, state,
                    {
                        "classes": classes,
                        "default_thresh": M.DEFAULT_THRESH,
                        "pos_weight": np.asarray(pos_weight).tolist(),
                        "epoch": epoch,
                        "val_f1_micro": best_score,
                        "normalize": normalize,
                        "imagenet_mean": IMAGENET_MEAN,
                        "imagenet_std": IMAGENET_STD,
                    },
                )
                print(f"Best model saved -> {best_path} (best VAL F1micro={best_score:.4f})")
            else:
                patience += 1
                print(f"Early stopping counter: {patience}/{args.patience}")
                if patience >= args.patience:
                    print("\nEARLY STOPPING (based on VAL)")
                    break

        print(f"\nTotal training time: {(time.time()-t0)/60:.1f} min")
        with open(os.path.join(run_dir, "history.json"), "w") as f:
            json.dump(history, f, indent=2)
        _plot_curve(run_dir, history["train_loss"], history["val_loss"], "Loss", "loss", "loss_curve.png")
        _plot_curve(run_dir, history["train_f1micro"], history["val_f1micro"], "F1 micro", "F1", "f1_micro.png")
        _plot_curve(run_dir, history["train_f1macro"], history["val_f1macro"], "F1 macro", "F1", "f1_macro.png")
        _plot_curve(run_dir, history["train_sev_mae"], history["val_sev_mae"], "Severity MAE", "MAE", "sev_mae.png")

    # ---- load checkpoint for tune/test/diagnostics ----
    ckpt_path = args.checkpoint or best_path
    if not os.path.exists(ckpt_path):
        raise FileNotFoundError(f"Checkpoint not found: {ckpt_path}")
    print("\n===== LOADING CHECKPOINT =====")
    print("Checkpoint:", os.path.abspath(ckpt_path))
    loaded = load_checkpoint(ckpt_path, var_template)
    params, batch_stats = loaded["params"], loaded["batch_stats"]

    tuned_thresholds = list(thresholds)
    meta_path = ckpt_path + ".json"
    ckpt_meta = {}
    if os.path.exists(meta_path):
        with open(meta_path, encoding="utf-8") as f:
            ckpt_meta = json.load(f)

    if args.bn_recal_passes > 0:
        # BN recalibration ("precise BN", as in engine/model.py): the
        # training EMA tracks batch statistics of a moving network, so the
        # best checkpoint's stats lag its weights.  The backbone has no
        # dropout, so frozen-param train-mode sweeps re-center them.
        # Adopted only if val F1-micro does not degrade — the same val-set
        # gating early stopping and threshold tuning already use.
        print(f"\n===== BN RECALIBRATION ({args.bn_recal_passes} passes) =====")

        @jax.jit
        def _refresh(p, bs, x):
            _, upd = model.apply(
                {"params": p, "batch_stats": bs}, x, train=True,
                mutable=["batch_stats"],
            )
            return upd["batch_stats"]

        recal_stats = batch_stats
        for _ in range(args.bn_recal_passes):
            for x, _y, _s, _paths in train_loader:
                recal_stats = _refresh(params, recal_stats, x)

        base_va, _, _ = run_epoch(
            val_loader, classes, thresholds, train=False,
            params=params, batch_stats=batch_stats, eval_step=eval_step,
        )
        recal_va, _, _ = run_epoch(
            val_loader, classes, thresholds, train=False,
            params=params, batch_stats=recal_stats, eval_step=eval_step,
        )
        print(
            f"VAL F1micro: stock={base_va['f1_micro']:.4f} "
            f"recalibrated={recal_va['f1_micro']:.4f}"
        )
        if recal_va["f1_micro"] >= base_va["f1_micro"]:
            batch_stats = recal_stats
            ckpt_meta["bn_recalibration_passes"] = int(args.bn_recal_passes)
            ckpt_meta["val_f1_micro_recalibrated"] = float(recal_va["f1_micro"])
            save_checkpoint(
                ckpt_path,
                SimpleNamespace(params=params, batch_stats=batch_stats),
                ckpt_meta,
            )
            print(f"Recalibrated stats adopted -> {ckpt_path}")
        else:
            print("Recalibrated stats rejected (val F1 degraded); keeping stock stats")

    if args.tune_thresh:
        print("\n===== THRESHOLD TUNING (VAL) =====")
        grid = [float(x) for x in np.linspace(args.th_min, args.th_max, args.th_steps)]
        _, _, val_out = run_epoch(
            val_loader, classes, thresholds, train=False,
            params=params, batch_stats=batch_stats, eval_step=eval_step,
        )
        report = M.tune_thresholds_per_class_for_f1(
            val_out["probs"], val_out["y_true"], classes, grid
        )
        tuned_thresholds = [report["thresholds"][c] for c in classes]
        with open(os.path.join(run_dir, "thresholds_val.json"), "w") as f:
            json.dump(report, f, indent=2)
        print("Tuned thresholds:", report["thresholds"])
        print(
            f"VAL F1micro (tuned): {report['val_f1_micro']:.4f} | "
            f"VAL F1macro (tuned): {report['val_f1_macro']:.4f}"
        )

    if args.test:
        print("\n===== FINAL TEST =====")
        te, _, _ = run_epoch(
            test_loader, classes, tuned_thresholds, train=False,
            params=params, batch_stats=batch_stats, eval_step=eval_step,
        )
        print(
            f"Test  loss={te['loss']:.4f} (cls={te['loss_cls']:.4f}, sev={te['loss_sev']:.4f}) | "
            f"F1micro={te['f1_micro']:.4f} F1macro={te['f1_macro']:.4f} | sevMAE={te['sev_mae']:.4f}"
        )
        with open(os.path.join(run_dir, "per_class_f1_test.json"), "w") as f:
            json.dump(te["f1_by_class"], f, indent=2)
        summary = {
            "run_dir": run_dir,
            "dataset_root": dataset_root,
            "checkpoint_used": ckpt_path,
            "backend": jax.default_backend(),
            "classes": classes,
            "default_threshold": M.DEFAULT_THRESH,
            "tuned_thresholds_used": {c: float(tuned_thresholds[i]) for i, c in enumerate(classes)},
            "lambda_severity": LAMBDA_SEVERITY,
            "pos_weight": ckpt_meta.get("pos_weight"),
            "best_val_f1_micro_default_thresh": float(ckpt_meta.get("val_f1_micro", -1.0)),
            "best_epoch": int(ckpt_meta.get("epoch", -1)),
            "normalization": {"enabled": normalize, "mean": IMAGENET_MEAN, "std": IMAGENET_STD},
            "test": {k: te[k] for k in ("loss", "loss_cls", "loss_sev", "f1_micro", "f1_macro", "sev_mae")},
        }
        with open(os.path.join(run_dir, "summary.json"), "w") as f:
            json.dump(summary, f, indent=2)

    if args.diagnostics:
        print("\n===== DIAGNOSTICS =====")
        for split_name, loader in (("val", val_loader), ("test", test_loader)):
            _, _, out = run_epoch(
                loader, classes, tuned_thresholds, train=False,
                params=params, batch_stats=batch_stats, eval_step=eval_step,
            )
            run_diagnostics(
                dataset_root=dataset_root, run_dir=run_dir, split_name=split_name,
                classes=classes, probs=out["probs"], y_true=out["y_true"],
                rel_paths=out["paths"], tuned_thresholds=tuned_thresholds,
                topk=args.diag_topk,
            )
            print(f"Diagnostics saved for {split_name.upper()}")

    print("\n[OK]")


if __name__ == "__main__":
    main()
