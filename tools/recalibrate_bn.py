#!/usr/bin/env python
"""Re-estimate BN running statistics for an already-trained checkpoint.

Same operation as ``train.bn_recalibration`` (engine/model.py
``Model.recalibrate_bn``), runnable post-hoc on any existing weight file:
frozen-weight, dropout-free sweeps over the config's *training* data in the
network's ``stats_refresh`` mode, then the checkpoint is rewritten with the
re-centered statistics (parameters untouched).

Usage: python tools/recalibrate_bn.py -c config/task.json [--passes 3]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from run import build_session  # noqa: E402
from multi_degradation_image_enhancement_tpu.utils.config import parse  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("-c", "--config", required=True, help="task JSON config")
    ap.add_argument("--passes", type=int, default=3)
    args = ap.parse_args()

    ns = argparse.Namespace(config=args.config, phase="train")
    logger, engine = build_session(parse(ns))
    try:
        engine.recalibrate_bn(passes=args.passes)
    finally:
        logger.close()


if __name__ == "__main__":
    main()
