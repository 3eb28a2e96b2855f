"""Torch-default weight re-initialization for parity experiments.

Flax and torch draw from different default distributions:

* torch ``Conv2d``/``Linear``/``ConvTranspose2d``: ``kaiming_uniform_(a=√5)``
  → ``U(±1/√fan_in)`` (variance ``1/(3·fan_in)``), bias ``U(±1/√fan_in)``
  (``torch/nn/modules/conv.py reset_parameters``);
* Flax ``nn.Conv``/``nn.Dense``: ``lecun_normal`` (variance ``1/fan_in`` —
  **3× the torch variance**), bias zeros.

Under the reference recipe (80 epochs, 102-image parity sets) the two inits
reach systematically different minima — measured round 3: equal train loss
but paired per-image test deltas up to −0.8 dB on tasks the reference
"wins" (tools/parity/paired_eval.py).  This module re-draws an initialized
CDAN params tree with torch-matching statistics so that difference can be
measured and, where it matters, removed.  Opt-in via config
``train.torch_init`` (engine) or by calling :func:`torch_reinit` directly.

Torch quirk faithfully reproduced: ``ConvTranspose2d`` (the reference
decoder's de1–de4, ``/root/reference/models/cdan.py:103-115``) computes
``fan_in`` from weight dim 1 — the **output** channels — so those four
layers use ``fan = 9·c_out``.

BatchNorm (scale=1, bias=0, stats 0/1) is identical in both frameworks and
left untouched.
"""

from __future__ import annotations

import hashlib
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

# Params-tree node names whose kernels follow the torch ConvTranspose2d
# fan-in convention (fan = kh·kw·c_out instead of kh·kw·c_in).
_TRANSPOSE_FAN_NODES = ("de1_conv", "de2_conv", "de3_conv", "de4_conv")


def _path_key(base: jax.Array, path: Tuple[str, ...]) -> jax.Array:
    digest = hashlib.md5("/".join(path).encode()).digest()
    return jax.random.fold_in(base, int.from_bytes(digest[:4], "little"))


def _fan_in(kernel: jax.Array, path: Tuple[str, ...]) -> int:
    if kernel.ndim == 4:  # HWIO conv kernel
        kh, kw, cin, cout = kernel.shape
        if any(node in path for node in _TRANSPOSE_FAN_NODES):
            return kh * kw * cout
        return kh * kw * cin
    if kernel.ndim == 2:  # Dense [in, out]
        return kernel.shape[0]
    raise ValueError(f"unexpected kernel rank {kernel.ndim} at {'/'.join(path)}")


def torch_reinit(params: Dict[str, Any], key: jax.Array) -> Dict[str, Any]:
    """Re-draw every conv/dense kernel+bias with torch-default statistics.

    Walks the params tree; any dict node holding a ``kernel`` leaf is
    treated as a conv/dense layer: kernel and bias are redrawn
    ``U(±1/√fan_in)``.  Nodes without a ``kernel`` (BatchNorm scale/bias)
    are left untouched.  Deterministic per-path keys, independent of
    traversal order.
    """

    def walk(node: Any, path: Tuple[str, ...]) -> Any:
        if not isinstance(node, dict):
            return node
        if "kernel" in node and not isinstance(node["kernel"], dict):
            kernel = node["kernel"]
            fan = _fan_in(kernel, path)
            bound = 1.0 / (fan ** 0.5)
            kkey = _path_key(key, path + ("kernel",))
            out = dict(node)
            out["kernel"] = jax.random.uniform(
                kkey, kernel.shape, jnp.float32, -bound, bound
            ).astype(kernel.dtype)
            if "bias" in node and not isinstance(node["bias"], dict):
                bkey = _path_key(key, path + ("bias",))
                out["bias"] = jax.random.uniform(
                    bkey, node["bias"].shape, jnp.float32, -bound, bound
                ).astype(node["bias"].dtype)
            # anything else in the node (unexpected) passes through
            for k, v in node.items():
                if k not in ("kernel", "bias"):
                    out[k] = walk(v, path + (k,))
            return out
        return {k: walk(v, path + (k,)) for k, v in node.items()}

    return walk(params, ())
