"""JSON config loading with the reference's semantics.

Schema parity with the reference config system (``utils/parser.py:10-39`` in
/root/reference): JSON files may contain ``//`` line comments, missing keys
read as ``None`` instead of raising, and the CLI phase overrides the
``phase`` key.  The same 11 task configs (noise.json etc.) drive this
framework unchanged.
"""

from __future__ import annotations

import argparse
import json
from collections import OrderedDict
from typing import Any, Dict, List, Union


class NoneDict(dict):
    """A dict whose missing keys read as ``None`` (reference utils/parser.py:10-12)."""

    def __missing__(self, key):
        return None


def dict_to_nonedict(config: Any) -> Any:
    """Recursively convert dicts to :class:`NoneDict` (reference utils/parser.py:15-25)."""
    if isinstance(config, dict):
        return NoneDict(**{k: dict_to_nonedict(v) for k, v in config.items()})
    if isinstance(config, list):
        return [dict_to_nonedict(v) for v in config]
    return config


def _strip_line_comments(text: str) -> str:
    """Strip ``//`` line comments the way the reference does (utils/parser.py:29-33).

    The reference splits every line on ``//`` and keeps the prefix.  We keep
    the exact behavior for config parity (which means ``//`` inside string
    values is also stripped — configs must not rely on it, and none do).
    """
    out_lines = []
    for line in text.splitlines():
        out_lines.append(line.split("//")[0])
    return "\n".join(out_lines)


def load_config(path: str, phase: str | None = None) -> NoneDict:
    """Load a JSON config file, strip ``//`` comments, optionally set phase."""
    with open(path, "r", encoding="utf-8") as f:
        json_str = _strip_line_comments(f.read())
    config = json.loads(json_str, object_pairs_hook=OrderedDict)
    if phase is not None:
        config["phase"] = phase
    return dict_to_nonedict(config)


def parse(args: argparse.Namespace) -> NoneDict:
    """CLI-compatible entry: ``parse(args)`` with ``args.config`` / ``args.phase``.

    Mirrors reference ``utils/parser.py:28-39``.
    """
    return load_config(args.config, phase=args.phase)


def cfg_get(cfg: Union[Dict, None], *keys: str, default: Any = None) -> Any:
    """Safely walk nested config keys, returning ``default`` when absent."""
    node: Any = cfg
    for k in keys:
        if not isinstance(node, dict) or node.get(k) is None:
            return default
        node = node[k]
    return node
