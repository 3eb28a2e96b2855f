"""multi_degradation_image_enhancement_tpu — a TPU-native multi-degradation image
enhancement framework (JAX / Flax / optax / Orbax / pjit / Pallas).

A from-scratch, TPU-first re-design of the capabilities of
danielluca00/Multi-Degradation-Image-Enhancement (see /root/repo/SURVEY.md):

* nine synthetic degradation families, implemented as batched *on-device* JAX
  transforms (``ops.degradations``) instead of offline OpenCV scripts;
* the CDAN encoder–decoder restorer with CBAM attention (``models.cdan``),
  in NHWC/bf16 for the TPU MXU;
* config-driven loss / metric / post-processing / transform factories
  (``ops.losses``, ``ops.metrics``, ``ops.post_processing``);
* a functional, jit-compiled train/eval engine with Orbax checkpointing
  (``engine``), driven by the same JSON config schema + CLI as the reference;
* data-parallel & spatial sharding over a ``jax.sharding.Mesh`` (``parallel``);
* a multi-label degradation classifier workload (``classification``).

Import as ``import multi_degradation_image_enhancement_tpu as mdie``.
"""

import os as _os

from multi_degradation_image_enhancement_tpu.version import __version__

# Persistent XLA compilation cache: TPU compiles in this environment go
# through a remote-compile tunnel (minutes for the full model), so caching
# across processes matters.  Respect an explicit user setting.
#
# The TPU-vs-CPU decision is made from the environment WITHOUT touching the
# backend: calling jax.default_backend() here would initialize XLA at import
# time, which breaks jax.distributed.initialize() on multi-host pods (it
# must run before any backend use).  CPU stays uncached — CPU AOT cache
# entries are machine-feature sensitive and can SIGILL across host types;
# TPU compiles are the expensive ones anyway.
if not _os.environ.get("JAX_COMPILATION_CACHE_DIR"):
    _platforms = _os.environ.get("JAX_PLATFORMS", "")
    _cpu_only = _platforms and set(_platforms.split(",")) <= {"cpu"}
    if not _cpu_only and (
        "axon" in _os.environ.get("PYTHONPATH", "")
        or _os.environ.get("TPU_SKIP_MDS_QUERY") is not None
        or _os.path.exists("/dev/accel0")
        or "tpu" in _platforms
    ):
        try:
            import jax as _jax

            _cache = _os.path.expanduser("~/.jax_cache")
            _os.makedirs(_cache, exist_ok=True)
            _jax.config.update("jax_compilation_cache_dir", _cache)
        except Exception:
            pass

__all__ = ["__version__"]
