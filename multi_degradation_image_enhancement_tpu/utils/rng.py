"""Deterministic randomness: explicit JAX PRNG keys instead of global seeds.

The reference seeds python/NumPy/torch globally and pins cuDNN
(``utils/reproducibility.py:6-24``); JAX programs are deterministic by
construction, so the equivalent here is a root key threaded through init,
dropout, shuffling, and on-device degradation.  ``set_seed`` exists for CLI
parity and seeds the few host-side NumPy consumers (epoch shuffling uses its
own seeded generator regardless).
"""

from __future__ import annotations

import random

import jax
import numpy as np


def set_seed_and_cudnn(seed_value: int = 42) -> jax.Array:
    """Reference-compatible name; returns the root JAX key for the run."""
    random.seed(seed_value)
    np.random.seed(seed_value)
    return jax.random.key(seed_value)


set_seed = set_seed_and_cudnn
