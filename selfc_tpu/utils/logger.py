"""Logging setup (reference utils/util.py:82-96) + image dump helpers."""

from __future__ import annotations

import logging
import os
from datetime import datetime

import cv2
import numpy as np


def setup_logger(name, root, phase, level=logging.INFO, screen=False, tofile=False):
    lg = logging.getLogger(name)
    fmt = logging.Formatter(
        "%(asctime)s.%(msecs)03d - %(levelname)s: %(message)s",
        datefmt="%y-%m-%d %H:%M:%S",
    )
    lg.setLevel(level)
    lg.handlers = []
    if tofile:
        os.makedirs(root, exist_ok=True)
        stamp = datetime.now().strftime("%y%m%d-%H%M%S")
        fh = logging.FileHandler(
            os.path.join(root, f"{phase}_{stamp}.log"), mode="w"
        )
        fh.setFormatter(fmt)
        lg.addHandler(fh)
    if screen:
        sh = logging.StreamHandler()
        sh.setFormatter(fmt)
        lg.addHandler(sh)
    return lg


def tensor2img(img, min_max=(0, 1)):
    """(H, W, 3) float RGB [0,1] -> uint8 BGR for cv2 (reference
    utils/util.py:104-133 semantics, channels-last)."""
    a = np.asarray(img, np.float32)
    a = np.clip((a - min_max[0]) / (min_max[1] - min_max[0]), 0, 1)
    a = (a * 255.0).round().astype(np.uint8)
    if a.ndim == 3 and a.shape[2] == 3:
        a = a[:, :, ::-1]  # RGB -> BGR
    return a


def save_img(img_bgr_u8, path):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    cv2.imwrite(path, img_bgr_u8)


def tensor2heatmap(x, min_max=None):
    """Single-channel map (H, W) -> BGR uint8 jet heatmap (the reference's
    matplotlib-based tensor2heatmap, utils/util.py:148-179, via cv2)."""
    a = np.asarray(x, np.float32)
    if a.ndim == 3:
        a = a.mean(axis=-1)
    lo, hi = (float(a.min()), float(a.max())) if min_max is None else min_max
    a = (a - lo) / max(hi - lo, 1e-12)
    u8 = (np.clip(a, 0, 1) * 255).astype(np.uint8)
    return cv2.applyColorMap(u8, cv2.COLORMAP_JET)
