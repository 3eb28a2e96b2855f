"""Minimal torchmetrics API shim for the parity harness (our own code).

The container has no torchmetrics wheel; the reference imports
``PeakSignalNoiseRatio`` / ``StructuralSimilarityIndexMeasure`` /
``LearnedPerceptualImagePatchSimilarity`` (``utils/metrics_factory.py:9-11``,
``utils/loss_factory.py:13-14`` in /root/reference).  This package provides
just those names with torchmetrics-default *semantics*, implemented from the
published definitions in pure torch — the same math as our JAX
``ops/ssim.py`` — so both stacks are scored by identical metric code.

Scope: functional per-call values only (the reference calls the modules
batch-by-batch and averages itself, ``models/model.py:289-295``); no state
accumulation, no ``compute()``/``update()`` API.
"""

from __future__ import annotations

import torch


def _data_range(preds: torch.Tensor, target: torch.Tensor) -> torch.Tensor:
    # torchmetrics data_range=None: max over both tensors of (max - min).
    return torch.maximum(preds.max() - preds.min(), target.max() - target.min())


class PeakSignalNoiseRatio(torch.nn.Module):
    """10·log10(range² / mse) over every element of the batch."""

    def __init__(self, data_range=None):
        super().__init__()
        self.data_range = data_range

    def forward(self, preds: torch.Tensor, target: torch.Tensor) -> torch.Tensor:
        dr = (
            _data_range(preds, target)
            if self.data_range is None
            else torch.as_tensor(float(self.data_range))
        )
        mse = torch.mean((preds - target) ** 2)
        return 10.0 * torch.log10(dr * dr / mse)
