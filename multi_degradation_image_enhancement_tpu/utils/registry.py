"""Name → constructor registry replacing the reference's reflective imports.

The reference instantiates networks / datasets / models by importing a
``[module_path, ClassName]`` pair from JSON at runtime
(``utils/parser.py:42-73`` in /root/reference).  We keep the same config
schema but resolve names through an explicit registry with a compatibility
alias table, so the *reference's own config files* run unmodified against
the TPU framework (e.g. ``["models.cdan", "CDAN"]`` resolves to the Flax
CDAN here).  Unknown names fall back to a real dotted import, preserving
user extensibility, and failures raise ``NotImplementedError`` with the
same message shape as the reference.
"""

from __future__ import annotations

import importlib
from functools import partial
from types import FunctionType
from typing import Any, Callable, Dict, Optional, Tuple

_REGISTRY: Dict[Tuple[str, str], Callable] = {}

_PKG = "multi_degradation_image_enhancement_tpu"

# Reference dotted module paths → TPU-framework module paths.  This is what
# lets a config written for the PyTorch reference (SURVEY.md §2 C13) drive
# this framework verbatim.
_MODULE_ALIASES: Dict[str, str] = {
    "models.cdan": f"{_PKG}.models.cdan",
    "models.cbam": f"{_PKG}.models.cbam",
    "models.model": f"{_PKG}.engine.model",
    "data.dataset": f"{_PKG}.data.dataset",
    "data.synthetic": f"{_PKG}.data.synthetic",
}


def register(module_path: str, class_name: str) -> Callable:
    """Decorator: register a constructor under (module_path, class_name)."""

    def deco(fn_or_cls):
        _REGISTRY[(module_path, class_name)] = fn_or_cls
        return fn_or_cls

    return deco


def resolve(module_path: str, class_name: str) -> Callable:
    """Resolve a ``[module, Class]`` config name to a constructor."""
    # 1. alias the reference's module paths onto ours
    module_path = _MODULE_ALIASES.get(module_path, module_path)
    # 2. explicit registry
    if (module_path, class_name) in _REGISTRY:
        return _REGISTRY[(module_path, class_name)]
    # 3. plain import fallback (user extensions)
    module = importlib.import_module(module_path)
    return getattr(module, class_name)


def init_obj(
    obj_config: Dict[str, Any],
    *args: Any,
    default_file_name: str = "default file",
    given_module: Optional[Any] = None,
    init_type: str = "Network",
    **modify_kwargs: Any,
) -> Any:
    """Instantiate an object from its config block.

    Signature-compatible with the reference (``utils/parser.py:42-73``):
    ``obj_config['name']`` is either ``[module_path, ClassName]`` or a bare
    class name looked up in ``default_file_name``; ``obj_config['args']``
    are constructor kwargs, overridden by ``modify_kwargs``.
    """
    name = obj_config["name"]
    if isinstance(name, list):
        file_name, class_name = name[0], name[1]
    else:
        file_name, class_name = default_file_name, name

    try:
        if given_module is not None:
            attr = getattr(given_module, class_name)
        else:
            attr = resolve(file_name, class_name)

        kwargs = dict(obj_config.get("args", {}) or {})
        kwargs.update(modify_kwargs)

        if isinstance(attr, type):
            obj = attr(*args, **kwargs)
        elif isinstance(attr, FunctionType):
            obj = partial(attr, *args, **kwargs)
            obj.__name__ = attr.__name__  # type: ignore[attr-defined]
        else:
            obj = attr(*args, **kwargs)
    except Exception as e:  # same failure contract as the reference
        raise NotImplementedError(
            f"{init_type} [{class_name}() from {file_name}] not recognized: {e}"
        ) from e

    return obj


def create_model(**cfg_model: Any) -> Any:
    """Create the model engine from ``config['model']['which_model']``.

    Mirrors reference ``utils/parser.py:76-85``.
    """
    config = cfg_model["config"]
    model_config = dict(config["model"]["which_model"])
    model_config["args"] = dict(model_config.get("args", {}) or {})
    model_config["args"].update(cfg_model)
    return init_obj(model_config, default_file_name=f"{_PKG}.engine.model", init_type="Model")


def define_network(network_config: Dict[str, Any]) -> Any:
    """Mirrors reference ``utils/parser.py:88-90``."""
    return init_obj(network_config, default_file_name=f"{_PKG}.models.cdan", init_type="Network")


def define_dataset(dataset_config: Dict[str, Any]) -> Any:
    """Mirrors reference ``utils/parser.py:93-95``."""
    return init_obj(dataset_config, default_file_name=f"{_PKG}.data.dataset", init_type="Dataset")
