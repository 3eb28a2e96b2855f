"""torchvision.models shim: names exist, use fails loudly (no weights here)."""

from __future__ import annotations


class VGG19_Weights:  # noqa: N801 - mirrors the torchvision name
    DEFAULT = "DEFAULT"
    IMAGENET1K_V1 = "IMAGENET1K_V1"


def vgg19(*args, **kwargs):  # pragma: no cover - guard only
    raise RuntimeError(
        "torchvision.models.vgg19 is unavailable in the parity harness "
        "(no pretrained weights); drop 'vgg_perceptual' from the config."
    )


def __getattr__(name):  # any other model constructor
    def _unavailable(*args, **kwargs):
        raise RuntimeError(f"torchvision.models.{name} is unavailable in the parity harness.")

    return _unavailable
