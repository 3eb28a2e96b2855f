#!/usr/bin/env python
"""CLI runner: ``python run.py -c config/X.json -p {train,test}``.

CLI parity with the reference runner (``run.py:8-58`` in /root/reference):
parse config (with ``//`` comments), seed, logger, dataset → dataloader →
network → model, then train (with post-train plots) or test.  Both this
framework's configs (``multi_degradation_image_enhancement_tpu/config/``)
and the reference's own config files are accepted.
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


def main(config):
    set_seed_and_cudnn()

    logger = ExperimentLogger(config)
    if logger.run_dir():
        print(f"[LOGGER] Run dir: {logger.run_dir()}")

    phase = config["phase"]
    dataset = define_dataset(config[phase]["dataset"])
    dataloader = define_dataloader(dataset, config[phase]["dataloader"]["args"])
    network = define_network(config["model"]["networks"][0])

    model = create_model(
        config=config,
        network=network,
        dataloader=dataloader,
        logger=logger,
    )

    if phase == "train":
        model.train()
        logger.generate_plots()
    else:
        model.test()

    logger.close()


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "-c", "--config", type=str,
        default="multi_degradation_image_enhancement_tpu/config/noise.json",
        help="Path to the JSON configuration file",
    )
    parser.add_argument(
        "-p", "--phase", type=str, choices=["train", "test"], default="train",
        help="Phase to run (train or test)",
    )
    args = parser.parse_args()
    main(parse(args))
