from multi_degradation_image_enhancement_tpu.data.dataset import (
    PairedDataset,
    UnpairedDataset,
)
from multi_degradation_image_enhancement_tpu.data.loader import (
    DeviceDataLoader,
    define_dataloader,
)
from multi_degradation_image_enhancement_tpu.data.synthetic import SyntheticPairedDataset
from multi_degradation_image_enhancement_tpu.data.transforms import build_transforms

__all__ = [
    "PairedDataset",
    "UnpairedDataset",
    "DeviceDataLoader",
    "define_dataloader",
    "SyntheticPairedDataset",
    "build_transforms",
]
