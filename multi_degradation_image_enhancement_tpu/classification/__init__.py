from multi_degradation_image_enhancement_tpu.classification.model import MultiHeadClassifier

__all__ = ["MultiHeadClassifier"]
