from multi_degradation_image_enhancement_tpu.engine.model import BaseModel, Model
from multi_degradation_image_enhancement_tpu.engine.state import TrainState

__all__ = ["BaseModel", "Model", "TrainState"]
