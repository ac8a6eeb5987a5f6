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


class ProgressBar:
    """Terminal progress reporter (reference utils/util.py:278-325)."""

    def __init__(self, task_num: int = 0, bar_width: int = 40, start=True):
        import time as _t

        self.task_num = task_num
        self.bar_width = bar_width
        self.completed = 0
        self._time = _t
        if start:
            self.start()

    def start(self):
        import sys

        if self.task_num > 0:
            sys.stdout.write(
                f"[{' ' * self.bar_width}] 0/{self.task_num}, elapsed: 0s\n"
            )
        sys.stdout.flush()
        self.start_time = self._time.time()

    def update(self, msg: str = "In progress..."):
        import sys

        self.completed += 1
        elapsed = max(self._time.time() - self.start_time, 1e-9)
        fps = self.completed / elapsed
        if self.task_num > 0:
            pct = self.completed / float(self.task_num)
            eta = int(elapsed * (1 - pct) / max(pct, 1e-9) + 0.5)
            marks = int(self.bar_width * pct)
            bar = ">" * marks + "-" * (self.bar_width - marks)
            sys.stdout.write(
                f"\r[{bar}] {self.completed}/{self.task_num}, "
                f"{fps:.1f} task/s, elapsed: {int(elapsed + .5)}s, "
                f"ETA: {eta:5d}s  {msg}"
            )
        else:
            sys.stdout.write(
                f"\rcompleted: {self.completed}, elapsed: "
                f"{int(elapsed + .5)}s, {fps:.1f} tasks/s"
            )
        sys.stdout.flush()


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
