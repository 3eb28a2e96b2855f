"""Checkpointing: single-file weights (reference parity) + full-state resume.

The reference saves only ``state_dict`` weight files and can never resume
training (optimizer state is never written — SURVEY.md §5).  Here:

  * :func:`save_weights` / :func:`load_weights` — one file holding
    ``{params, batch_stats}`` (msgpack via flax.serialization), written to
    the config's ``model_path/model_name`` exactly like the reference's
    best-checkpoint flow (``models/base.py:52-55``);
  * :func:`save_train_state` / :func:`restore_train_state` — full
    params+opt+step resume via Orbax, an intentional capability upgrade.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np
from flax import serialization

from multi_degradation_image_enhancement_tpu.engine.state import TrainState


def save_weights(path: str, params: Any, batch_stats: Any) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    payload = {
        "params": jax.device_get(params),
        "batch_stats": jax.device_get(batch_stats),
    }
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(payload))


def load_weights(path: str, params_template: Any, batch_stats_template: Any) -> Dict[str, Any]:
    with open(path, "rb") as f:
        data = f.read()
    template = {"params": params_template, "batch_stats": batch_stats_template}
    return serialization.from_bytes(template, data)


def save_train_state(ckpt_dir: str, state: TrainState) -> None:
    """Full-state checkpoint (params + BN stats + optimizer + step)."""
    import orbax.checkpoint as ocp

    ckpt_dir = os.path.abspath(ckpt_dir)
    payload = {
        "step": jax.device_get(state.step),
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
        "opt_state": jax.device_get(state.opt_state),
    }
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(ckpt_dir, payload, force=True)
    ckptr.wait_until_finished()


def restore_train_state(ckpt_dir: str, template: TrainState) -> TrainState:
    import orbax.checkpoint as ocp

    ckpt_dir = os.path.abspath(ckpt_dir)
    abstract = {
        "step": jax.device_get(template.step),
        "params": jax.device_get(template.params),
        "batch_stats": jax.device_get(template.batch_stats),
        "opt_state": jax.device_get(template.opt_state),
    }
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(ckpt_dir, abstract)
    return template.replace(
        step=restored["step"],
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state=restored["opt_state"],
    )
