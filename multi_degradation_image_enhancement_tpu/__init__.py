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

from multi_degradation_image_enhancement_tpu.version import __version__

__all__ = ["__version__"]
