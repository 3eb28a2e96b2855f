"""Comment-preserving JSON config IO for the tools/ scripts.

Shipped task configs may carry ``//`` provenance comment lines (e.g.
``config/color_distortion.json``'s measured n_epoch deviation note).  The
runtime loader (`utils/config.load_config`) strips them, but the config
*rewriting* tools (`set_recal_defaults.py`, `set_precision_defaults.py`)
were reading with plain ``json.load`` — which raises ``JSONDecodeError``
on the first commented config — and their ``json.dump`` rewrite would
drop the provenance note.  This helper fixes both: parse through the
package's comment stripper, and on rewrite re-anchor each comment block
before the first original successor line that still exists in the new
text (falling back to a trailing position only if the anchor vanished).
"""

from __future__ import annotations

import json
import os
import sys
from typing import Dict, List, Tuple

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from multi_degradation_image_enhancement_tpu.utils.config import (  # noqa: E402
    _strip_line_comments,
)


def load_commented_json(path: str) -> Tuple[dict, List[Tuple[str, str]]]:
    """Return ``(config_dict, comments)``.

    ``comments`` is a list of ``(comment_line, anchor)`` pairs where
    ``anchor`` is the stripped content of the first non-comment line that
    followed the comment in the original file ("" if none).
    """
    with open(path) as f:
        raw_lines = f.read().splitlines()
    comments: List[Tuple[str, str]] = []
    pending: List[str] = []
    for line in raw_lines:
        if line.lstrip().startswith("//"):
            pending.append(line)
            continue
        if pending and line.strip():
            comments.extend((c, line.strip()) for c in pending)
            pending = []
    comments.extend((c, "") for c in pending)
    cfg = json.loads(_strip_line_comments("\n".join(raw_lines)))
    return cfg, comments


def dump_commented_json(
    path: str, cfg: Dict, comments: List[Tuple[str, str]]
) -> None:
    """Write ``cfg`` as indented JSON, re-inserting preserved comments
    before their original successor lines (matched on stripped content,
    first occurrence; unmatched comments are appended before the closing
    brace so provenance is never silently lost)."""
    text = json.dumps(cfg, indent=2) + "\n"
    lines = text.splitlines()
    out: List[str] = []
    remaining = list(comments)
    for line in lines:
        stripped = line.strip()
        matched = [c for c, anchor in remaining if anchor == stripped]
        if matched:
            out.extend(matched)
            remaining = [(c, a) for c, a in remaining if a != stripped]
        out.append(line)
    if remaining:
        # anchor lines were edited away; keep the notes at the tail
        closing = out.pop()
        out.extend(c for c, _ in remaining)
        out.append(closing)
    with open(path, "w") as f:
        f.write("\n".join(out) + "\n")
