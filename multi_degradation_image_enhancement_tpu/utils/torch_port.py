"""Port PyTorch-reference CDAN checkpoints into this framework.

Maps a reference ``CDAN().state_dict()`` (``models/cdan.py`` /
``models/cbam.py`` in /root/reference) onto the Flax CDAN's
{params, batch_stats} tree, so users can bring their trained
``CDAN_<task>.pt`` weights to TPU unchanged.  Works on a dict of NumPy
arrays (no torch import here) — use ``tools/convert_torch_weights.py`` or
``numpy_state_dict`` below to materialize one from a ``.pt`` file.

Layout conversions:
  * Conv2d OIHW → HWIO;
  * ConvTranspose2d(k3,s1,p1) [in,out,kh,kw] → spatially flipped HWIO conv
    kernel (the reference's stride-1 deconvs are conv-equivalent);
  * Linear [out,in] → Dense kernel [in,out];
  * BatchNorm weight/bias → scale/bias, running stats → batch_stats.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _conv(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.transpose(2, 3, 1, 0))


def _deconv_as_conv(w: np.ndarray) -> np.ndarray:
    # [in, out, kh, kw] → flip spatial → [kh, kw, in, out]
    return np.ascontiguousarray(w[:, :, ::-1, ::-1].transpose(2, 3, 0, 1))


def _linear(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.T)


def _dense_block_entries(flax_prefix: Tuple[str, ...], torch_prefix: str):
    """Param mapping for one DenseBlock (4 growth layers + transition)."""
    out = []
    for i in range(4):
        out += [
            (flax_prefix + (f"bn_{i}",), f"{torch_prefix}.layers.{i}.0", "bn"),
            (flax_prefix + (f"conv_{i}",), f"{torch_prefix}.layers.{i}.2", "conv"),
        ]
    out += [
        (flax_prefix + ("bn_t",), f"{torch_prefix}.transition_layer.0", "bn"),
        (flax_prefix + ("conv_t",), f"{torch_prefix}.transition_layer.2", "conv"),
    ]
    return out


def _cbam_entries(flax_prefix: Tuple[str, ...], torch_prefix: str):
    return [
        (flax_prefix + ("ChannelGate_0", "fc1"), f"{torch_prefix}.ChannelGate.mlp.1", "linear"),
        (flax_prefix + ("ChannelGate_0", "fc2"), f"{torch_prefix}.ChannelGate.mlp.3", "linear"),
        (flax_prefix + ("SpatialGate_0", "spatial", "Conv_0"),
         f"{torch_prefix}.SpatialGate.spatial.conv", "conv_nobias"),
        (flax_prefix + ("SpatialGate_0", "spatial", "BatchNorm_0"),
         f"{torch_prefix}.SpatialGate.spatial.bn", "bn"),
    ]


def _mapping():
    """(flax module path, torch module prefix, kind) for the whole CDAN."""
    entries = []
    for i, name in enumerate(["conv1", "conv2", "conv3", "conv4"], 1):
        entries += [
            (("encoder", name, "Conv_0"), f"encoder.conv{i}.conv", "conv"),
            (("encoder", name, "BatchNorm_0"), f"encoder.conv{i}.bn", "bn"),
        ]
    for i in range(1, 4):
        entries += _dense_block_entries(("encoder", f"dense{i}"), f"encoder.dense{i}")
    entries += _cbam_entries(("bottleneck",), "bottleneck")
    for i in range(1, 5):
        entries += [
            (("decoder", f"de{i}_conv"), f"decoder.conv{i}", "deconv"),
            (("decoder", f"de{i}_bn"), f"decoder.bn{i}", "bn"),
        ]
    for i in range(1, 4):
        entries += _cbam_entries(("decoder", f"cbam{i}"), f"decoder.cbam{i}")
    entries += _dense_block_entries(("decoder", "final_dense"), "decoder.final_dense")
    return entries


def port_reference_cdan(
    state_dict: Dict[str, np.ndarray], variables: Dict[str, Any]
) -> Dict[str, Any]:
    """Fill a Flax CDAN's init'd ``variables`` from a reference state_dict.

    Args:
      state_dict: torch parameter name → NumPy array (CPU).
      variables: the result of ``CDAN().init(...)`` (used as shape template).

    Returns a new {params, batch_stats} dict; raises on any missing or
    shape-mismatched tensor, so silent partial ports are impossible.
    """
    from flax.core import unfreeze

    out = jax.tree.map(np.array, unfreeze(dict(variables)))

    def put(collection: str, path: Tuple[str, ...], leaf: str, value: np.ndarray):
        node = out[collection]
        for p in path:
            node = node[p]
        if node[leaf].shape != value.shape:
            raise ValueError(
                f"{collection}/{'/'.join(path)}/{leaf}: torch {value.shape} vs flax {node[leaf].shape}"
            )
        node[leaf] = value.astype(node[leaf].dtype)

    for path, tprefix, kind in _mapping():
        if kind in ("conv", "conv_nobias"):
            put("params", path, "kernel", _conv(state_dict[f"{tprefix}.weight"]))
            if kind == "conv":
                put("params", path, "bias", state_dict[f"{tprefix}.bias"])
        elif kind == "deconv":
            put("params", path, "kernel", _deconv_as_conv(state_dict[f"{tprefix}.weight"]))
            put("params", path, "bias", state_dict[f"{tprefix}.bias"])
        elif kind == "linear":
            put("params", path, "kernel", _linear(state_dict[f"{tprefix}.weight"]))
            put("params", path, "bias", state_dict[f"{tprefix}.bias"])
        elif kind == "bn":
            put("params", path, "scale", state_dict[f"{tprefix}.weight"])
            put("params", path, "bias", state_dict[f"{tprefix}.bias"])
            put("batch_stats", path, "mean", state_dict[f"{tprefix}.running_mean"])
            put("batch_stats", path, "var", state_dict[f"{tprefix}.running_var"])
        else:
            raise AssertionError(kind)

    return jax.tree.map(jnp.asarray, out)


def numpy_state_dict(pt_path: str) -> Dict[str, np.ndarray]:
    """Load a torch ``.pt`` state_dict into NumPy arrays (torch required)."""
    import torch

    sd = torch.load(pt_path, map_location="cpu")
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return {k: v.detach().numpy() for k, v in sd.items()}
