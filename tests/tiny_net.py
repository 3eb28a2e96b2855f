"""A tiny CDAN-interface-compatible network for fast engine tests.

Exposes the same call contract as ``models.cdan.CDAN`` (NHWC in [0,1],
``train`` flag, dropout rng, BatchNorm batch_stats) but compiles in seconds
on the 1-core CPU host.  Referenced from configs as
``["tests.tiny_net", "TinyNet"]`` to exercise the registry's dotted-import
fallback path too.
"""

import jax
import jax.numpy as jnp
from flax import linen as nn


class TinyNet(nn.Module):
    features: int = 8
    dtype: jnp.dtype = jnp.float32
    stats_refresh: bool = False  # BN-recalibration mode, as in models.cdan.CDAN

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        norm = train or self.stats_refresh
        h = nn.Conv(self.features, (3, 3), padding="SAME", dtype=self.dtype)(x)
        h = nn.BatchNorm(use_running_average=not norm, momentum=0.9, dtype=self.dtype)(h)
        h = nn.relu(h)
        h = nn.Dropout(0.1, deterministic=not train)(h)
        h = nn.Conv(3, (3, 3), padding="SAME", dtype=self.dtype)(h)
        return jax.nn.sigmoid(h + x).astype(jnp.float32)
