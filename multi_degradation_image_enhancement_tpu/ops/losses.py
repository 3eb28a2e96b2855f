"""Config-driven loss pipeline in pure JAX.

Capability parity with the reference loss factory
(``utils/loss_factory.py:17-235`` in /root/reference): weighted multi-term
losses with per-term paired/unpaired mode filtering and per-component
reporting.  Terms: ``mse``, ``l1``, ``charbonnier`` (eps=1e-3),
``vgg_perceptual`` (MSE on frozen VGG19 features[:layers], default 20),
``ssim`` (1−SSIM), ``lpips`` (alex), ``gradient_l1`` (L1 on Sobel
gradients, optional luma-only).

Differences from the reference, by design:
  * everything is a pure function of arrays — the whole pipeline runs inside
    the jitted train step (the reference syncs ``loss.item()`` per batch);
  * the reference's closure late-binding bug (duplicate same-name terms
    silently sharing the *last* term's args, ``loss_factory.py:160-167``
    pattern) is fixed — each term binds its own args (SURVEY.md §7 quirks:
    "fix latent bugs no config exercises").
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Dict, List, Optional

import jax
import jax.numpy as jnp

from multi_degradation_image_enhancement_tpu.ops.image import conv3x3_fixed, rgb_to_luma
from multi_degradation_image_enhancement_tpu.ops.perceptual import (
    LPIPS,
    VGG19Features,
    init_frozen_params,
)
from multi_degradation_image_enhancement_tpu.ops.ssim import masked_mean
from multi_degradation_image_enhancement_tpu.ops.ssim import ssim as ssim_fn

_SOBEL_X = jnp.array([[-1.0, 0.0, 1.0], [-2.0, 0.0, 2.0], [-1.0, 0.0, 1.0]], jnp.float32)
_SOBEL_Y = jnp.array([[-1.0, -2.0, -1.0], [0.0, 0.0, 0.0], [1.0, 2.0, 1.0]], jnp.float32)


def sobel_gradients(x: jax.Array) -> jax.Array:
    """Per-channel Sobel gradients: [B,H,W,C] → [B,H,W,C,2] (dx, dy).

    Zero padding, matching ``F.conv2d(..., padding=1)`` in the reference
    (``utils/loss_factory.py:90-103``).
    """
    gx = conv3x3_fixed(x, _SOBEL_X)
    gy = conv3x3_fixed(x, _SOBEL_Y)
    return jnp.stack([gx, gy], axis=-1)


@dataclass
class LossTerm:
    name: str
    weight: float
    mode: str  # "paired" | "unpaired"
    fn: Callable[..., jax.Array]


class LossPipeline:
    """Weighted sum of loss terms; returns each component plus ``total``.

    Pure and jit-compatible: ``is_paired`` is a static Python bool, all
    returned values are scalar arrays on device.

    ``worst_case`` (optional ``{"fraction": f, "scale": s}``) enables
    worst-case-weighted training: the per-image total loss is computed for
    every image in the batch, the worst ``ceil(f·B)`` images get weight
    ``s`` (the rest weight 1, weighted-mean normalized), and ``total``
    becomes that weighted mean.  The selection is ``stop_gradient``-ed, so
    gradients flow through the per-image losses only.  This targets
    per-image tail failure modes (the color_distortion full-scale deficit
    localizes to a heavy worst-image tail — tools/parity/results_r3/
    full_color_paired_eval.json); the reference has no equivalent (its
    loss is always the batch mean, ``utils/loss_factory.py:42-56``).
    Applied only when called with ``training=True`` — eval totals stay
    plain batch means, comparable across runs.
    """

    def __init__(self, terms: List[LossTerm], worst_case: Optional[Dict[str, Any]] = None):
        self.terms = terms
        self.worst_case = dict(worst_case) if worst_case else None

    def __call__(
        self,
        outputs: jax.Array,
        targets: Optional[jax.Array] = None,
        inputs: Optional[jax.Array] = None,
        is_paired: bool = True,
        mask: Optional[jax.Array] = None,
        training: bool = False,
    ) -> Dict[str, jax.Array]:
        if training and self.worst_case is not None and is_paired:
            return self._call_worst_case(outputs, targets, inputs, mask)
        components: Dict[str, jax.Array] = {}
        total = jnp.zeros((), dtype=jnp.float32)
        for term in self.terms:
            if term.mode == "paired" and not is_paired:
                continue
            if term.mode == "unpaired" and is_paired:
                continue
            val = term.fn(outputs=outputs, targets=targets, inputs=inputs, mask=mask)
            val = jnp.mean(val) if val.ndim != 0 else val
            components[term.name] = val
            total = total + term.weight * val
        components["total"] = total
        return components

    def _call_worst_case(
        self,
        outputs: jax.Array,
        targets: Optional[jax.Array],
        inputs: Optional[jax.Array],
        mask: Optional[jax.Array],
    ) -> Dict[str, jax.Array]:
        b = outputs.shape[0]
        frac = float(self.worst_case.get("fraction", 0.25))
        scale = float(self.worst_case.get("scale", 3.0))
        k = min(max(int(round(frac * b)), 1), b)

        valid = (
            jnp.ones((b,), jnp.float32)
            if mask is None
            else jnp.reshape(mask, (b,)).astype(jnp.float32)
        )
        components: Dict[str, jax.Array] = {}
        per_image_total = jnp.zeros((b,), jnp.float32)
        for term in self.terms:
            if term.mode == "unpaired":
                continue
            fn = term.fn
            if inputs is None:
                val = jax.vmap(
                    lambda o, t, fn=fn: fn(outputs=o[None], targets=t[None])
                )(outputs, targets)
            else:
                val = jax.vmap(
                    lambda o, t, i, fn=fn: fn(
                        outputs=o[None], targets=t[None], inputs=i[None]
                    )
                )(outputs, targets, inputs)
            val = val.reshape((b,)).astype(jnp.float32)
            # report the plain (unweighted) masked mean so logged components
            # stay comparable with stock runs
            denom = jnp.maximum(jnp.sum(valid), 1.0)
            components[term.name] = jnp.sum(val * valid) / denom
            per_image_total = per_image_total + term.weight * val

        # top-k selection on detached losses; padded (invalid) images can
        # never be selected and carry zero weight
        detached = jax.lax.stop_gradient(per_image_total)
        ranked = jnp.where(valid > 0, detached, -jnp.inf)
        thresh = jnp.sort(ranked)[b - k]
        weights = jnp.where(ranked >= thresh, scale, 1.0) * valid
        components["total"] = jnp.sum(weights * per_image_total) / jnp.maximum(
            jnp.sum(weights), 1e-8
        )
        return components


def _require_targets(name: str, targets):
    if targets is None:
        raise ValueError(f"{name} loss requires targets (paired dataset).")


def build_loss_pipeline(
    loss_cfg: Optional[Dict[str, Any]], device: Any = None
) -> LossPipeline:
    """Build a :class:`LossPipeline` from a config block.

    Accepts the exact schema of the reference
    (``utils/loss_factory.py:106-126``), including the fallback to a single
    MSE term when disabled/empty.  ``device`` is accepted for signature
    parity and ignored (placement is JAX's job).
    """
    if not loss_cfg or not loss_cfg.get("enabled", True):
        loss_cfg = {"terms": [{"name": "mse", "weight": 1.0, "args": {}}]}
    terms_cfg = loss_cfg.get("terms", []) or [{"name": "mse", "weight": 1.0, "args": {}}]

    built: List[LossTerm] = []
    for t in terms_cfg:
        name = t["name"]
        weight = float(t.get("weight", 1.0))
        args = t.get("args", {}) or {}
        mode = t.get("mode", "paired") or "paired"
        built.append(LossTerm(name=name, weight=weight, mode=mode, fn=_make_term(name, args)))
    return LossPipeline(built, worst_case=loss_cfg.get("worst_case"))


def _make_term(name: str, args: Dict[str, Any]) -> Callable[..., jax.Array]:
    if name == "mse":

        def mse(outputs, targets=None, inputs=None, mask=None):
            _require_targets("mse", targets)
            return masked_mean(jnp.square(outputs - targets), mask)

        return mse

    if name == "l1":

        def l1(outputs, targets=None, inputs=None, mask=None):
            _require_targets("l1", targets)
            return masked_mean(jnp.abs(outputs - targets), mask)

        return l1

    if name == "charbonnier":
        eps = float(args.get("eps", 1e-3))

        def charbonnier(outputs, targets=None, inputs=None, mask=None):
            _require_targets("charbonnier", targets)
            diff = outputs - targets
            return masked_mean(jnp.sqrt(diff * diff + eps * eps), mask)

        return charbonnier

    if name == "vgg_perceptual":
        layers = int(args.get("layers", 20))
        module = VGG19Features(num_layers=layers)
        variables = init_frozen_params(
            module, [jnp.zeros((1, 32, 32, 3), jnp.float32)], "vgg19_features.npz"
        )

        def vgg_perceptual(outputs, targets=None, inputs=None, mask=None):
            _require_targets("vgg_perceptual", targets)
            fo = module.apply(variables, outputs)
            ft = module.apply(variables, targets)
            return masked_mean(jnp.square(fo - ft), mask)

        return vgg_perceptual

    if name == "ssim":

        def ssim_loss(outputs, targets=None, inputs=None, mask=None):
            _require_targets("ssim", targets)
            return 1.0 - ssim_fn(outputs, targets, mask=mask)

        return ssim_loss

    if name == "lpips":
        net = args.get("net", args.get("net_type", "alex"))
        if net not in ("alex", "vgg", "squeeze"):
            raise ValueError(f"lpips net_type '{net}' not supported (alex/vgg/squeeze).")
        module = LPIPS(net_type=net)
        variables = init_frozen_params(
            module,
            [jnp.zeros((1, 64, 64, 3), jnp.float32), jnp.zeros((1, 64, 64, 3), jnp.float32)],
            f"lpips_{net}.npz",
        )

        def lpips(outputs, targets=None, inputs=None, mask=None):
            _require_targets("lpips", targets)
            per_sample = module.apply(variables, outputs, targets)  # [B]
            return masked_mean(per_sample, mask)

        return lpips

    if name == "channel_mean":
        # Framework extension (not in the reference's factory,
        # /root/reference/utils/loss_factory.py:138-233): L1 between
        # per-image per-channel spatial means.  Targets global
        # color-statistics errors directly — the failure mode of the
        # color_distortion task (per-channel gain uniform(0.6,1.4),
        # /root/reference/datasets_generation/
        # generate_paired_degradation_dataset.py:175-178), where pixelwise
        # terms dilute the single global-gain signal over all pixels.

        def channel_mean(outputs, targets=None, inputs=None, mask=None):
            _require_targets("channel_mean", targets)
            axes = tuple(range(1, outputs.ndim - 1))  # spatial dims of NHWC
            out_means = jnp.mean(outputs, axis=axes)  # [B, C]
            tgt_means = jnp.mean(targets, axis=axes)
            return masked_mean(jnp.abs(out_means - tgt_means), mask)

        return channel_mean

    if name == "gradient_l1":
        to_gray = bool(args.get("to_gray", False))

        def gradient_l1(outputs, targets=None, inputs=None, mask=None):
            _require_targets("gradient_l1", targets)
            x, y = outputs, targets
            if to_gray:
                x = rgb_to_luma(x) if x.shape[-1] == 3 else jnp.mean(x, axis=-1, keepdims=True)
                y = rgb_to_luma(y) if y.shape[-1] == 3 else jnp.mean(y, axis=-1, keepdims=True)
            return masked_mean(jnp.abs(sobel_gradients(x) - sobel_gradients(y)), mask)

        return gradient_l1

    raise ValueError(f"Unknown loss term: {name}")
