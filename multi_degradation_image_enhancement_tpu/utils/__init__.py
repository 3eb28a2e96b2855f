from multi_degradation_image_enhancement_tpu.utils.config import (
    NoneDict,
    dict_to_nonedict,
    load_config,
    parse,
)
from multi_degradation_image_enhancement_tpu.utils.registry import (
    create_model,
    define_dataset,
    define_network,
    init_obj,
    register,
    resolve,
)

__all__ = [
    "NoneDict",
    "dict_to_nonedict",
    "load_config",
    "parse",
    "create_model",
    "define_dataset",
    "define_network",
    "init_obj",
    "register",
    "resolve",
]
