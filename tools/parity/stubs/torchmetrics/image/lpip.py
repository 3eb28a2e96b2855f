"""LPIPS import shim: the name exists so reference modules import cleanly;
instantiation fails loudly.  The parity configs exclude lpips on both stacks
(no published backbone weights in this container — VERDICT.md round 1)."""

from __future__ import annotations


class LearnedPerceptualImagePatchSimilarity:  # pragma: no cover - guard only
    def __init__(self, *args, **kwargs):
        raise RuntimeError(
            "LPIPS is not available in the parity harness (no pretrained "
            "weights in this container); exclude 'lpips' from the config."
        )
