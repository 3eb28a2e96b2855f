"""Config-driven metrics pipeline (PSNR / SSIM / LPIPS) in pure JAX.

Capability parity with the reference metrics factory
(``utils/metrics_factory.py:14-111`` in /root/reference): same config
schema, same paired/unpaired mode filtering, same metric set.  PSNR/SSIM
follow torchmetrics default semantics (see ``ops.ssim``); LPIPS shares the
frozen AlexNet backbone of ``ops.perceptual``.

Everything is jit-compatible and stays on device — the engine averages
per-batch metric values over batches, matching the reference's averaging
(``models/model.py:289-295``).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Dict, List, Optional

import jax
import jax.numpy as jnp

from multi_degradation_image_enhancement_tpu.ops.perceptual import LPIPS, init_frozen_params
from multi_degradation_image_enhancement_tpu.ops.ssim import masked_mean
from multi_degradation_image_enhancement_tpu.ops.ssim import psnr as psnr_fn
from multi_degradation_image_enhancement_tpu.ops.ssim import ssim as ssim_fn


@dataclass
class MetricItem:
    name: str
    mode: str  # "paired" | "unpaired"
    fn: Callable[..., jax.Array]


class MetricsPipeline:
    """Ordered list of metric items (NOT a name-keyed dict).

    The reference stores items in a dict keyed by name
    (``utils/metrics_factory.py:62``), so two items sharing a name —
    e.g. the same metric under ``paired`` and ``unpaired`` modes, legal in
    the list schema — silently drop all but the last.  Holding a list keeps
    every item; the mode filter then selects which ones contribute to the
    output mapping for a given call.
    """

    def __init__(self, metrics: List[MetricItem]):
        self.metrics = list(metrics)

    def __call__(
        self,
        outputs: jax.Array,
        targets: Optional[jax.Array] = None,
        inputs: Optional[jax.Array] = None,
        is_paired: bool = True,
        mask: Optional[jax.Array] = None,
    ) -> Dict[str, jax.Array]:
        out: Dict[str, jax.Array] = {}
        for item in self.metrics:
            if item.mode == "paired" and not is_paired:
                continue
            if item.mode == "unpaired" and is_paired:
                continue
            val = item.fn(outputs=outputs, targets=targets, inputs=inputs, mask=mask)
            out[item.name] = jnp.mean(val) if val.ndim != 0 else val
        return out


def _require_targets(name: str, targets):
    if targets is None:
        raise ValueError(f"{name} metric requires targets (paired dataset).")


def build_metrics_pipeline(
    metrics_cfg: Optional[Dict[str, Any]], device: Any = None
) -> MetricsPipeline:
    """Build a :class:`MetricsPipeline`; ``device`` kept for signature parity."""
    if not metrics_cfg or not metrics_cfg.get("enabled", True):
        return MetricsPipeline([])

    metrics: List[MetricItem] = []
    for it in metrics_cfg.get("items", []) or []:
        name = it["name"]
        args = it.get("args", {}) or {}
        mode = it.get("mode", "paired") or "paired"

        if name == "psnr":

            def psnr(outputs, targets=None, inputs=None, mask=None):
                _require_targets("psnr", targets)
                return psnr_fn(outputs, targets, mask=mask)

            metrics.append(MetricItem("psnr", mode, psnr))

        elif name == "ssim":

            def ssim(outputs, targets=None, inputs=None, mask=None):
                _require_targets("ssim", targets)
                return ssim_fn(outputs, targets, mask=mask)

            metrics.append(MetricItem("ssim", mode, ssim))

        elif name == "lpips":
            net = args.get("net", args.get("net_type", "alex"))
            if net not in ("alex", "vgg", "squeeze"):
                raise ValueError(f"lpips net_type '{net}' not supported (alex/vgg/squeeze).")
            module = LPIPS(net_type=net)
            variables = init_frozen_params(
                module,
                [jnp.zeros((1, 64, 64, 3), jnp.float32), jnp.zeros((1, 64, 64, 3), jnp.float32)],
                f"lpips_{net}.npz",
            )

            def lpips(outputs, targets=None, inputs=None, mask=None, _m=module, _v=variables):
                _require_targets("lpips", targets)
                return masked_mean(_m.apply(_v, outputs, targets), mask)

            metrics.append(MetricItem("lpips", mode, lpips))

        else:
            raise ValueError(f"Unknown metric: {name}")

    return MetricsPipeline(metrics)
