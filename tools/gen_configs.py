#!/usr/bin/env python
"""Generate the 11 task configs (+ synthetic on-device variants).

Recipes (loss terms, aug probabilities, post-processing, eval switches)
follow the reference task configs in /root/reference/config/*.json — see
SURVEY.md §2 C13.  Emitted in this framework's preferred layout; the
reference's own config files also run unchanged via the registry aliases.
"""

from __future__ import annotations

import json
import os

OUT = os.path.join(os.path.dirname(__file__), "..",
                   "multi_degradation_image_enhancement_tpu", "config")

CHARB = {"name": "charbonnier", "weight": 1.0, "args": {"eps": 1e-3}}


def ssim(w):
    return {"name": "ssim", "weight": w}


def vgg(w):
    return {"name": "vgg_perceptual", "weight": w, "args": {"layers": 20}}


def lpips(w):
    return {"name": "lpips", "weight": w, "args": {"net": "alex"}}


def grad(w):
    return {"name": "gradient_l1", "weight": w, "args": {"to_gray": True}}


STD_AUGS = [
    {"name": "HorizontalFlip", "args": {"p": 0.5}},
    {"name": "VerticalFlip", "args": {"p": 0.2}},
    {"name": "RandomRotate90", "args": {"p": 0.15}},
]

# task -> (loss_terms, extra_train_augs(replaces std if not None), post_processing, eval_post, save_postprocessed)
TASKS = {
    "blur": ([CHARB, ssim(0.5)], None, None, False, False),
    "noise": (
        [CHARB, ssim(0.5)],
        None,
        {"enabled": False, "ops": [{"name": "soft_denoise", "args": {"sigma": 0.15}}]},
        False,
        False,
    ),
    "low_light": (
        [{"name": "mse", "weight": 1.0}, vgg(0.25), ssim(0.5), lpips(0.5)],
        [
            {"name": "HorizontalFlip", "args": {"p": 0.5}},
            {"name": "VerticalFlip", "args": {"p": 0.15}},
            {"name": "RandomRotate90", "args": {"p": 0.1}},
            {"name": "RandomGamma", "args": {"gamma_limit": [70, 130], "p": 0.2}},
            {"name": "RandomBrightnessContrast",
             "args": {"brightness_limit": 0.1, "contrast_limit": 0.1, "p": 0.25}},
        ],
        {"enabled": True, "ops": [
            {"name": "enhance_contrast", "args": {"contrast_factor": 1.03}},
            {"name": "enhance_color", "args": {"saturation_factor": 1.55}},
        ]},
        True,
        True,
    ),
    "jpeg": (
        [{"name": "l1", "weight": 1.0}, vgg(0.25), ssim(0.5), lpips(0.5)],
        None,
        {"enabled": False, "ops": [
            {"name": "enhance_contrast", "args": {"contrast_factor": 1.03}},
            {"name": "enhance_color", "args": {"saturation_factor": 1.55}},
        ]},
        False,
        False,
    ),
    "pixelation": ([CHARB, ssim(0.5), vgg(0.03), grad(0.1)], None, None, False, False),
    "motion_blur": ([CHARB, ssim(0.6), vgg(0.05)], None, None, False, False),
    "high_light": ([CHARB, ssim(0.6), vgg(0.05), lpips(0.05)], None, None, False, False),
    "low_contrast": (
        [CHARB, ssim(0.4)],
        STD_AUGS + [
            {"name": "RandomBrightnessContrast",
             "args": {"brightness_limit": 0.08, "contrast_limit": 0.1, "p": 0.25}},
        ],
        None,
        False,
        False,
    ),
    "color_distortion": ([CHARB, ssim(0.4)], None, None, False, False),
    "pixelation_easy": ([CHARB, ssim(0.6), vgg(0.05), lpips(0.05), grad(0.3)], None, None, False, False),
    "pixelation_hard": ([CHARB, ssim(0.5), vgg(0.05), lpips(0.05), grad(0.35)], None, None, False, False),
}

TAIL_OPS = [
    {"name": "Resize", "args": {"height": 256, "width": 384}},
    {"name": "Normalize", "args": {"mean": [0.0, 0.0, 0.0], "std": [1.0, 1.0, 1.0]}},
    {"name": "ToTensorV2", "args": {}},
]


def make_config(task: str, synthetic: bool) -> dict:
    loss_terms, augs, pp, eval_post, save_pp = TASKS[task]
    augs = augs if augs is not None else STD_AUGS
    pp = pp if pp is not None else {"enabled": False, "ops": []}
    # curriculum presets map to the base pixelation degradation on device
    degradation = task if task in (
        "blur", "noise", "low_light", "jpeg", "pixelation", "motion_blur",
        "high_light", "low_contrast", "color_distortion",
    ) else "pixelation"

    def dataset_block(split: str, with_augs: bool):
        ops = (augs if with_augs else []) + TAIL_OPS
        if synthetic:
            return {
                "name": ["data.synthetic", "SyntheticPairedDataset"],
                "args": {
                    "degradation": degradation,
                    "n_images": 512 if split == "train" else 128,
                    "seed": 42 if split == "train" else 1042,
                    "transform": {"backend": "albumentations", "ops": ops},
                },
                **({"is_paired": True} if split == "test" else {}),
            }
        return {
            "name": ["data.dataset", "PairedDataset"],
            "args": {
                "input_root": f"../{task}/{split}/degraded",
                "target_root": f"../{task}/{split}/clean",
                "pairing_mode": "filename",
                "transform": {"backend": "albumentations", "ops": ops},
            },
            **({"is_paired": True} if split == "test" else {}),
        }

    name = f"{task}_synthetic" if synthetic else task
    return {
        "name": name,
        "task": name,
        "model": {
            "which_model": {"name": ["models.model", "Model"], "args": {}},
            "networks": [{"name": ["models.cdan", "CDAN"], "args": {}}],
        },
        "loss": {"enabled": True, "terms": loss_terms},
        "metrics": {
            "enabled": True,
            "items": [{"name": "psnr"}, {"name": "ssim"},
                      {"name": "lpips", "args": {"net": "alex"}}],
        },
        "evaluation": {"raw": True, "postprocessed": eval_post},
        "post_processing": pp,
        "save_outputs": {
            "enabled": True,
            "output_dir": f"outputs/{name}/",
            "max_images": 200,
            "format": "png",
            "save_raw": True,
            "save_postprocessed": save_pp,
            "raw_prefix": "raw_",
            "post_prefix": "pp_",
        },
        "logging": {
            "enabled": True,
            "root_dir": "runs",
            "save_config_copy": True,
            "train": {"log_every_n_batches": 0, "save_csv": True, "save_jsonl": True},
            "test": {"save_csv": True, "save_jsonl": True},
            "checkpoints": {"enabled": False, "every_n_epochs": 10},
        },
        "train": {
            "device": "tpu",
            "n_epoch": 80,
            "lr": 1e-3,
            "precision": "bf16",
            # Post-training BN stats re-estimation: +4.6 dB test PSNR on the
            # low_light parity run (PARITY.md); task-dependent, so only the
            # task it was measured on ships with it enabled.
            **({"bn_recalibration": {"passes": 3}} if task == "low_light" else {}),
            "dataset": dataset_block("train", True),
            "dataloader": {"args": {"batch_size": 16, "shuffle": True, "num_workers": 4}},
            "model_path": "weights/",
            "model_name": f"CDAN_{name}.pt",
        },
        "test": {
            "device": "tpu",
            "dataset": dataset_block("test", False),
            "dataloader": {"args": {"batch_size": 16, "shuffle": False, "num_workers": 4}},
            "model_path": "weights/",
            "model_name": f"CDAN_{name}.pt",
            "output_images_path": f"outputs/{name}/",
        },
    }


if __name__ == "__main__":
    os.makedirs(OUT, exist_ok=True)
    for task in TASKS:
        for synthetic in (False, True):
            cfg = make_config(task, synthetic)
            path = os.path.join(OUT, f"{cfg['name']}.json")
            with open(path, "w", encoding="utf-8") as f:
                json.dump(cfg, f, indent=2)
                f.write("\n")
            print("wrote", path)
