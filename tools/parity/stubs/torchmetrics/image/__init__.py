"""SSIM with torchmetrics-default semantics, in pure torch (parity shim).

Wang et al. SSIM: 11×11 Gaussian window (σ=1.5), k1=0.01, k2=0.03,
valid-mode windows, mean over all valid positions/channels/samples,
data range inferred from the data when not given — the same definition as
our JAX implementation (``multi_degradation_image_enhancement_tpu/ops/ssim.py``),
so the reference and our framework are evaluated by identical metric math.
Differentiable (the reference also uses it as a loss term,
``utils/loss_factory.py:180-189``).
"""

from __future__ import annotations

import torch


def _gaussian_taps(kernel_size: int, sigma: float) -> torch.Tensor:
    x = torch.arange(kernel_size, dtype=torch.float32) - (kernel_size - 1) / 2.0
    w = torch.exp(-(x * x) / (2.0 * sigma * sigma))
    return w / w.sum()


def _filter_valid(x: torch.Tensor, taps: torch.Tensor) -> torch.Tensor:
    """Separable valid-mode filter on [B,C,H,W] (H then W)."""
    k = taps.shape[0]
    out = sum(taps[i] * x[:, :, i : x.shape[2] - (k - 1) + i, :] for i in range(k))
    out = sum(taps[i] * out[:, :, :, i : out.shape[3] - (k - 1) + i] for i in range(k))
    return out


class StructuralSimilarityIndexMeasure(torch.nn.Module):
    def __init__(self, data_range=None, kernel_size: int = 11, sigma: float = 1.5,
                 k1: float = 0.01, k2: float = 0.03):
        super().__init__()
        self.data_range = data_range
        self.kernel_size = kernel_size
        self.sigma = sigma
        self.k1 = k1
        self.k2 = k2

    def forward(self, preds: torch.Tensor, target: torch.Tensor) -> torch.Tensor:
        if self.data_range is None:
            dr = torch.maximum(
                preds.max() - preds.min(), target.max() - target.min()
            ).detach()
        else:
            dr = torch.as_tensor(float(self.data_range))
        c1 = (self.k1 * dr) ** 2
        c2 = (self.k2 * dr) ** 2
        taps = _gaussian_taps(self.kernel_size, self.sigma).to(preds.dtype)

        mu_x = _filter_valid(preds, taps)
        mu_y = _filter_valid(target, taps)
        mu_xx = _filter_valid(preds * preds, taps)
        mu_yy = _filter_valid(target * target, taps)
        mu_xy = _filter_valid(preds * target, taps)

        sigma_x = mu_xx - mu_x * mu_x
        sigma_y = mu_yy - mu_y * mu_y
        sigma_xy = mu_xy - mu_x * mu_y

        num = (2.0 * mu_x * mu_y + c1) * (2.0 * sigma_xy + c2)
        den = (mu_x * mu_x + mu_y * mu_y + c1) * (sigma_x + sigma_y + c2)
        return torch.mean(num / den)
