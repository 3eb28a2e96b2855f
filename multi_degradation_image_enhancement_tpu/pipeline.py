"""Classify → route → restore: the full pipeline as a first-class component.

The reference only implies this flow — a multi-label classifier
(``classification/``) plus one CDAN checkpoint per degradation
(``CDAN_<task>.pt``); no routing script exists (SURVEY.md: "the routing…
exists only implicitly").  Here it is explicit and TPU-native, expressed as
a 9-expert routed model:

  * all experts' parameters are stacked on a leading expert axis (one
    pytree, [E, ...] leaves) — loading E weight files produced by the
    training engine;
  * **top1 mode**: each image routes to its argmax-probability degradation
    via capacity-C one-hot dispatch/combine einsums (the classic MoE
    dispatch pattern).  On an expert-parallel mesh the bank runs as a
    single ``vmap`` over the expert axis — one fused program, no host
    round trips; on a single chip the experts run via ``lax.map`` over a
    flat [E, cap, H·W·3] transport instead (the vmapped 5-D temporaries
    lane-pad 42×, OOMing HBM — rationale in ``RoutedRestorer._build``);
  * **sequential mode**: experts whose probability clears the per-class
    threshold run in severity order over the full batch with masked
    updates — higher fidelity for multi-degradation images at E× compute;
  * clean images (no class over threshold) pass through untouched;
  * expert parallelism: place the stacked params with
    ``expert_sharding(mesh)`` and the dispatched batch follows — XLA
    partitions the vmapped bank over the ``expert`` mesh axis (EP), with
    all-to-alls compiled from the dispatch/combine einsums.
"""

from __future__ import annotations

import os
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from multi_degradation_image_enhancement_tpu.ops.degradations import DEGRADATIONS

EXPERT_AXIS = "expert"


def stack_expert_variables(variable_list: Sequence[Dict[str, Any]]) -> Dict[str, Any]:
    """Stack E per-expert {params, batch_stats} pytrees on a new leading axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *variable_list)


def load_expert_bank(
    network: Any,
    weight_paths: Dict[str, str],
    input_hw: Tuple[int, int] = (256, 384),
) -> Tuple[List[str], Dict[str, Any]]:
    """Load per-degradation weight files into a stacked expert bank.

    ``weight_paths`` maps degradation name → engine weight file
    (``model_path/model_name`` as written by ``engine.checkpoint``).
    Returns (expert order, stacked variables).
    """
    from multi_degradation_image_enhancement_tpu.engine.checkpoint import load_weights

    names = list(weight_paths.keys())
    template = network.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        jnp.zeros((1, input_hw[0], input_hw[1], 3), jnp.float32),
        train=False,
    )
    loaded = []
    for name in names:
        path = weight_paths[name]
        if not os.path.isfile(path):
            raise FileNotFoundError(f"Expert '{name}' weights not found: {path}")
        w = load_weights(path, template["params"], template.get("batch_stats", {}))
        loaded.append({"params": w["params"], "batch_stats": w["batch_stats"]})
    return names, stack_expert_variables(loaded)


class RoutedRestorer:
    """A routed bank of per-degradation restorers behind one callable."""

    def __init__(
        self,
        network: Any,
        expert_names: Sequence[str],
        stacked_variables: Dict[str, Any],
        mode: str = "top1",
        capacity_factor: float = 2.0,
        mesh=None,
        ordering: str = "fixed",
    ):
        if mode not in ("top1", "sequential"):
            raise ValueError(f"Unknown routing mode: {mode}")
        if ordering not in ("fixed", "severity", "severity_asc"):
            raise ValueError(f"Unknown sequential ordering: {ordering}")
        self.network = network
        self.expert_names = list(expert_names)
        self.mode = mode
        self.ordering = ordering
        self.capacity_factor = float(capacity_factor)
        self.variables = stacked_variables
        # Pad the bank so the expert axis shards evenly over the mesh (e.g.
        # the 9-expert production bank on a 2- or 4-way expert axis): dummy
        # experts replicate expert 0 and are never routed to — the dispatch
        # one-hot has only n_real columns, padded with zeros below.
        self.n_pad = 0
        self._expert_parallel = mesh is not None and EXPERT_AXIS in mesh.axis_names
        if self._expert_parallel:
            from jax.sharding import NamedSharding, PartitionSpec as P

            axis = mesh.shape[EXPERT_AXIS]
            n_real = len(self.expert_names)
            self.n_pad = (-n_real) % axis
            if self.n_pad:
                self.variables = jax.tree.map(
                    lambda x: jnp.concatenate(
                        [x] + [x[:1]] * self.n_pad, axis=0
                    ),
                    self.variables,
                )
            sh = NamedSharding(mesh, P(EXPERT_AXIS))
            self.variables = jax.tree.map(lambda x: jax.device_put(x, sh), self.variables)
        self._restore = jax.jit(self._build(), static_argnames=())

    # ------------------------------------------------------------------ #

    def _apply_one(self, variables, images):
        return self.network.apply(variables, images, train=False)

    def _build(self) -> Callable:
        n_experts = len(self.expert_names)
        n_pad = self.n_pad

        # Bank application strategy.  ``vmap`` over the expert axis is what
        # expert-parallel meshes need (the E dim shards, experts run
        # concurrently across devices) — but on a single chip XLA lays the
        # vmapped forward's 5-D [E,cap,H,W,C] temporaries out with the small
        # channel dim minor and tile-pads it to the 128-lane register: the
        # decoder's C∈{3,16,67} skip tensors ballooned 42×/8×/1.9× to
        # 6×3.38 GB and the B=32·256×384·E9 step was a compile-time HBM OOM
        # (measured 2026-08-20; the round-4 flat-dispatch fix moved the same
        # pathology from the dispatch einsum into the expert forward).
        # ``lax.map`` keeps every expert's activations 4-D [cap,H,W,C] —
        # exactly the layouts the plain forward already compiles well — at
        # the cost of serializing experts, which a single chip does anyway.
        # Transport in/out of the bank stays [E,cap,H·W·3]-flat so the 5-D
        # form never exists in HBM.
        def apply_bank_flat(stacked_vars, x_flat, cap, h, w, c):
            """[E, cap, H·W·3] → [E, cap, H·W·3] through the per-expert nets."""
            if self._expert_parallel:
                def one(v, xf):
                    y = self._apply_one(v, xf.reshape(cap, h, w, c))
                    return y.reshape(cap, -1)
                return jax.vmap(one)(stacked_vars, x_flat)

            def one(slices):
                v, xf = slices
                y = self._apply_one(v, xf.reshape(cap, h, w, c))
                return y.reshape(cap, -1)
            return jax.lax.map(one, (stacked_vars, x_flat))

        if self.mode == "top1":

            def restore(images: jax.Array, probs: jax.Array, thresholds: jax.Array,
                        severities: jax.Array = None):
                b = images.shape[0]
                capacity = max(1, int(np.ceil(b / n_experts * self.capacity_factor)))
                expert_id = jnp.argmax(probs, axis=-1)  # [B]
                active = jnp.any(probs >= thresholds, axis=-1)  # clean → passthrough

                onehot = jax.nn.one_hot(expert_id, n_experts) * active[:, None]  # [B,E]
                if n_pad:  # mesh-padding experts get all-zero dispatch columns
                    onehot = jnp.pad(onehot, ((0, 0), (0, n_pad)))
                position = (jnp.cumsum(onehot, axis=0) - 1.0) * onehot  # rank in bucket
                keep = (position < capacity).astype(images.dtype) * onehot
                # dispatch[B, E, C]
                dispatch = keep[..., None] * jax.nn.one_hot(
                    position.astype(jnp.int32), capacity
                )
                # Dispatch/combine on [B, H·W·3]-flattened pixels: a 5-D
                # [E,C,H,W,3] einsum output gets a minor C=3 axis padded to
                # the 128-lane tile in HBM (measured 20.3 GB for a 3.5 GB
                # tensor at B=32·256×384·E9 — compile-time OOM); flat, the
                # minor axis is H·W·3 and padding vanishes.
                b_sh, h_sh, w_sh, c_sh = images.shape
                x_flat = images.reshape(b_sh, h_sh * w_sh * c_sh)
                x_disp = jnp.einsum(
                    "bec,bl->ecl", dispatch, x_flat,
                    preferred_element_type=jnp.float32,
                )  # [E, cap, H·W·3] — stays flat end to end
                y_disp = apply_bank_flat(
                    self.variables, x_disp, capacity, h_sh, w_sh, c_sh
                )  # [E, cap, H·W·3]
                routed = jnp.einsum(
                    "bec,ecl->bl", dispatch, y_disp,
                    preferred_element_type=jnp.float32,
                ).reshape(b_sh, h_sh, w_sh, c_sh)
                routed_mask = jnp.sum(dispatch, axis=(1, 2)) > 0  # dropped/clean → identity
                return jnp.where(routed_mask[:, None, None, None], routed, images)

        elif self.ordering == "fixed":  # sequential, bank order

            def restore(images: jax.Array, probs: jax.Array, thresholds: jax.Array,
                        severities: jax.Array = None):
                out = images
                for e in range(n_experts):
                    mask = probs[:, e] >= thresholds[e]
                    expert_vars = jax.tree.map(lambda x: x[e], self.variables)
                    restored = self._apply_one(expert_vars, out)
                    out = jnp.where(mask[:, None, None, None], restored, out)
                return out

        else:  # sequential, severity-informed application order
            descending = self.ordering == "severity"

            def restore(images: jax.Array, probs: jax.Array, thresholds: jax.Array,
                        severities: jax.Array = None):
                # Batch-level order: experts sorted by their mean severity
                # over the images that activate them (classifier severity
                # head).  "severity" = highest first — the outermost/dominant
                # degradation of a composition tends to present with the
                # highest apparent severity, and wrong-order sequential
                # composition costs up to −10.2 dB (PERF.md round 4);
                # "severity_asc" is the control direction.  Falls back to
                # bank order when no severities are provided.
                out = images
                if severities is None:
                    order = jnp.arange(n_experts)
                else:
                    active = (probs >= thresholds[None, :]).astype(jnp.float32)
                    score = jnp.sum(severities * active, axis=0) / jnp.maximum(
                        jnp.sum(active, axis=0), 1.0
                    )
                    order = jnp.argsort(-score if descending else score)
                for r in range(n_experts):
                    e = order[r]
                    mask = jnp.take(probs, e, axis=1) >= jnp.take(thresholds, e)
                    expert_vars = jax.tree.map(
                        lambda x: jax.lax.dynamic_index_in_dim(
                            x, e, 0, keepdims=False
                        ),
                        self.variables,
                    )
                    restored = self._apply_one(expert_vars, out)
                    out = jnp.where(mask[:, None, None, None], restored, out)
                return out

        return restore

    def __call__(
        self, images: jax.Array, probs: jax.Array, thresholds, severities=None
    ) -> jax.Array:
        """Restore a batch given classifier probabilities.

        Args:
          images: [B,H,W,3] float32 in [0,1].
          probs: [B,E] per-degradation probabilities (classifier sigmoids),
            columns ordered like ``expert_names``.
          thresholds: [E] per-class decision thresholds.
          severities: optional [B,E] severity scores (classifier severity
            head, sigmoid in [0,1]) — drives the application order in
            sequential mode with ``ordering="severity"``.
        """
        if severities is None:
            return self._restore(images, probs, jnp.asarray(thresholds, jnp.float32))
        return self._restore(
            images, probs, jnp.asarray(thresholds, jnp.float32), severities
        )


class FullPipeline:
    """Degraded image in → classified, routed, restored image out."""

    def __init__(
        self,
        classifier_model,
        classifier_variables: Dict[str, Any],
        router: RoutedRestorer,
        thresholds: Sequence[float],
        classes: Optional[Sequence[str]] = None,
        normalize: bool = True,
    ):
        self.router = router
        self.thresholds = jnp.asarray(thresholds, jnp.float32)
        classes = list(classes or DEGRADATIONS)
        # column permutation from classifier class order → expert order
        perm = [classes.index(n) for n in router.expert_names]

        from multi_degradation_image_enhancement_tpu.classification.model import (
            IMAGENET_MEAN,
            IMAGENET_STD,
        )

        mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
        std = jnp.asarray(IMAGENET_STD, jnp.float32)

        @jax.jit
        def classify_full(images01: jax.Array) -> Tuple[jax.Array, jax.Array]:
            x = (images01 - mean) / std if normalize else images01
            cls_logits, sev_logits = classifier_model.apply(
                classifier_variables, x, train=False
            )
            cols = jnp.asarray(perm)
            return (
                jax.nn.sigmoid(cls_logits)[:, cols],
                jax.nn.sigmoid(sev_logits)[:, cols],
            )

        self._classify_full = classify_full
        self._classify = jax.jit(lambda images01: classify_full(images01)[0])
        self._thr = self.thresholds[jnp.asarray(perm)]

    def __call__(self, images01: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """Returns (restored images, per-degradation probabilities)."""
        if self.router.mode == "sequential" and self.router.ordering != "fixed":
            probs, sevs = self._classify_full(images01)
            return self.router(images01, probs, self._thr, severities=sevs), probs
        probs = self._classify(images01)
        return self.router(images01, probs, self._thr), probs
