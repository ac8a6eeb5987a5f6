#!/usr/bin/env python
"""Rescaling evaluation CLI — mirrors reference codes/test_rescaling.py.

Usage: python test_rescaling.py -opt <yml> [--no-images]
"""

import argparse
import logging
import os

import jax

from selfc_tpu import config as option
from selfc_tpu.data import create_dataloader, create_dataset
from selfc_tpu.eval.rescaling import run_eval
from selfc_tpu.train.rescale_model import RescaleModel
from selfc_tpu.utils.logger import setup_logger


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-opt", type=str, required=True, help="Path to options YAML file.")
    parser.add_argument("--no-images", action="store_true", help="skip frame dumps")
    parser.add_argument("--fp32", action="store_true", default=True,
                        help="force fp32 matmuls for checkpoint parity")
    args = parser.parse_args()
    if args.fp32:
        jax.config.update("jax_default_matmul_precision", "highest")

    opt = option.parse(args.opt, is_train=False)

    os.makedirs(opt["path"]["results_root"] or ".", exist_ok=True)
    setup_logger("base", opt["path"]["log"], "test_" + opt["name"],
                 level=logging.INFO, screen=True, tofile=True)
    logger = logging.getLogger("base")

    test_loaders = []
    for phase, dataset_opt in sorted((opt["datasets"] or {}).items()):
        test_set = create_dataset(dataset_opt)
        loader = create_dataloader(test_set, dataset_opt)
        logger.info("Number of test images in [%s]: %d", dataset_opt["name"], len(test_set))
        test_loaders.append((dataset_opt["name"], loader))

    model = RescaleModel(opt)
    run_eval(opt, test_loaders, model, save_images=not args.no_images)


if __name__ == "__main__":
    main()
