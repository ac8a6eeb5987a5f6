"""Legacy single-image datasets (reference data/LQ_dataset.py,
LQGT_dataset.py — the BasicSR-style image SR paths kept for the IRN
baseline and GAN variants).

* ``LQDataset``   — LQ-only folder (inference).
* ``LQGTDataset`` — paired GT (+ optional LQ) folders; train-time crop /
  flip / rot augmentation with on-the-fly LQ via BD downsampling when no
  LQ root is given.

Channels-last float32 RGB in [0,1].
"""

from __future__ import annotations

import os
import random

import cv2
import numpy as np

from . import util
from .datasets import _bd_downsample_np

IMG_EXTS = (".jpg", ".jpeg", ".png", ".ppm", ".bmp", ".JPG", ".PNG")


def _list_images(root):
    out = []
    for dirpath, _, files in sorted(os.walk(root)):
        for f in sorted(files):
            if f.endswith(IMG_EXTS):
                out.append(os.path.join(dirpath, f))
    if not out:
        raise FileNotFoundError(f"{root} has no images")
    return out


class LQDataset:
    def __init__(self, opt):
        self.opt = opt
        self.paths = _list_images(opt["dataroot_LQ"])

    def __len__(self):
        return len(self.paths)

    def __getitem__(self, i):
        img = util.bgr2rgb(util.read_img(self.paths[i]))
        return {"LQ": np.ascontiguousarray(img), "LQ_path": self.paths[i]}


class LQGTDataset:
    def __init__(self, opt):
        self.opt = opt
        self.is_train = opt["phase"] == "train"
        self.paths_GT = _list_images(opt["dataroot_GT"])
        self.paths_LQ = (
            _list_images(opt["dataroot_LQ"]) if opt["dataroot_LQ"] else None
        )
        self.rng = random.Random()

    def __len__(self):
        return len(self.paths_GT)

    def __getitem__(self, i):
        scale = self.opt["scale"] or 4
        gt = util.read_img(self.paths_GT[i])  # BGR
        if self.paths_LQ:
            lq = util.read_img(self.paths_LQ[i])
        else:
            lq = _bd_downsample_np(gt, scale)
        if self.is_train:
            gt_size = self.opt["GT_size"] or 128
            lq_size = gt_size // scale
            H, W, _ = lq.shape
            rh = self.rng.randint(0, max(0, H - lq_size))
            rw = self.rng.randint(0, max(0, W - lq_size))
            lq = lq[rh : rh + lq_size, rw : rw + lq_size]
            gt = gt[rh * scale : rh * scale + gt_size,
                    rw * scale : rw * scale + gt_size]
            hflip = bool(self.opt["use_flip"]) and self.rng.random() < 0.5
            vflip = bool(self.opt["use_rot"]) and self.rng.random() < 0.5
            rot90 = bool(self.opt["use_rot"]) and self.rng.random() < 0.5
            lq = util.augment(lq, hflip, vflip, rot90)
            gt = util.augment(gt, hflip, vflip, rot90)
        return {
            "GT": np.ascontiguousarray(util.bgr2rgb(gt)),
            "LQ": np.ascontiguousarray(util.bgr2rgb(lq)),
            "GT_path": self.paths_GT[i],
            "LQ_path": self.paths_LQ[i] if self.paths_LQ else self.paths_GT[i],
        }
