from multi_degradation_image_enhancement_tpu.models.cbam import CBAM
from multi_degradation_image_enhancement_tpu.models.cdan import CDAN

__all__ = ["CBAM", "CDAN"]
