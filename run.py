#!/usr/bin/env python
"""CLI runner: ``python run.py -c config/X.json -p {train,test}``.

Same external contract as the reference runner (``run.py:8-58`` in
/root/reference): a JSON config (``//`` comments allowed) plus a phase flag
drive the whole run.  Both this framework's configs
(``multi_degradation_image_enhancement_tpu/config/``) and the reference's own
config files are accepted unchanged.

Internally the flow is organised the way the JAX stack wants it: the network
definition is resolved first (it is pure — no device state until the engine
initialises parameters), then the host data pipeline, then the engine which
owns jit/shard decisions and the logger sinks.
"""

from __future__ import annotations

import argparse

from multi_degradation_image_enhancement_tpu.data.loader import define_dataloader
from multi_degradation_image_enhancement_tpu.utils.config import parse
from multi_degradation_image_enhancement_tpu.utils.logger import ExperimentLogger
from multi_degradation_image_enhancement_tpu.utils.registry import (
    create_model,
    define_dataset,
    define_network,
)
from multi_degradation_image_enhancement_tpu.utils.rng import set_seed_and_cudnn


def build_session(config):
    """Resolve config into (logger, engine) without running anything.

    Split out from :func:`main` so tests and tools can assemble the exact
    CLI object graph programmatically.
    """
    set_seed_and_cudnn()
    logger = ExperimentLogger(config)

    phase = config["phase"]
    network = define_network(config["model"]["networks"][0])

    phase_cfg = config[phase]
    dataset = define_dataset(phase_cfg["dataset"])
    dataloader = define_dataloader(dataset, phase_cfg["dataloader"]["args"])

    engine = create_model(
        config=config, network=network, dataloader=dataloader, logger=logger
    )
    return logger, engine


def main(config):
    logger, engine = build_session(config)
    run_dir = logger.run_dir()
    if run_dir:
        print(f"[LOGGER] Run dir: {run_dir}")

    try:
        if config["phase"] == "train":
            engine.train()
            logger.generate_plots()
        else:
            engine.test()
    finally:
        logger.close()


def _cli():
    parser = argparse.ArgumentParser(
        description="Train or evaluate a restoration task from a JSON config."
    )
    parser.add_argument(
        "-c", "--config", type=str,
        default="multi_degradation_image_enhancement_tpu/config/noise.json",
        help="Path to the JSON configuration file",
    )
    parser.add_argument(
        "-p", "--phase", type=str, choices=["train", "test"], default="train",
        help="Phase to run (train or test)",
    )
    return parser.parse_args()


if __name__ == "__main__":
    main(parse(_cli()))
