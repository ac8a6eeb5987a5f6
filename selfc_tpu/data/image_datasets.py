"""Legacy single-image datasets (reference data/LQ_dataset.py,
LQGT_dataset.py, LRHR_seg_bg_dataset.py — the BasicSR-style image SR
paths kept for the IRN baseline and GAN variants).

* ``LQDataset``       — LQ-only folder (inference).
* ``LQGTDataset``     — paired GT (+ optional LQ) folders; train-time
  crop / flip / rot augmentation with on-the-fly LQ via BD downsampling
  when no LQ root is given.
* ``LRHRSegBGDataset`` — HR + segmentation maps + background pool for
  the SFTGAN-style path (reference LRHR_seg_bg_dataset.py:1-148).

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
        self.is_lmdb = opt["data_type"] == "lmdb"
        if self.is_lmdb:
            # reference keeps an lmdb branch for image data
            # (LQGTVID_dataset.py:53-58 / util.py:34-55); keys+sizes come
            # from meta_info.pkl, the env opens lazily per worker process
            self.paths_GT, self.sizes_GT = util.get_paths_from_lmdb(
                opt["dataroot_GT"]
            )
            self.paths_LQ = self.sizes_LQ = None
            if opt["dataroot_LQ"]:
                self.paths_LQ, self.sizes_LQ = util.get_paths_from_lmdb(
                    opt["dataroot_LQ"]
                )
            self._gt_env = self._lq_env = None
        else:
            self.paths_GT = _list_images(opt["dataroot_GT"])
            self.paths_LQ = (
                _list_images(opt["dataroot_LQ"]) if opt["dataroot_LQ"]
                else None
            )
        self.rng = random.Random()

    def __len__(self):
        return len(self.paths_GT)

    def _read_gt(self, i):
        if self.is_lmdb:
            if self._gt_env is None:
                self._gt_env = util.open_lmdb(self.opt["dataroot_GT"])
            return util.read_img_lmdb(
                self._gt_env, self.paths_GT[i],
                [int(s) for s in self.sizes_GT[i].split("_")]
                if isinstance(self.sizes_GT[i], str) else self.sizes_GT[i],
            )
        return util.read_img(self.paths_GT[i])

    def _read_lq(self, i):
        if self.is_lmdb:
            if self._lq_env is None:
                self._lq_env = util.open_lmdb(self.opt["dataroot_LQ"])
            return util.read_img_lmdb(
                self._lq_env, self.paths_LQ[i],
                [int(s) for s in self.sizes_LQ[i].split("_")]
                if isinstance(self.sizes_LQ[i], str) else self.sizes_LQ[i],
            )
        return util.read_img(self.paths_LQ[i])

    def __getitem__(self, i):
        scale = self.opt["scale"] or 4
        gt = self._read_gt(i)  # BGR
        if self.paths_LQ:
            lq = self._read_lq(i)
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


def imresize_matlab_np(img: np.ndarray, scale: float) -> np.ndarray:
    """Host-side (numpy) MATLAB bicubic resize — same contribution
    matrices as ops.resize.imresize_matlab, no device involvement (safe
    inside dataloader workers)."""
    from ..ops.resize import _matlab_weights

    H, W = img.shape[:2]
    oh, ow = int(H * scale), int(W * scale)
    mh = _matlab_weights(H, oh, scale)
    mw = _matlab_weights(W, ow, scale)
    y = np.einsum("oh,hwc->owc", mh, img.astype(np.float32))
    return np.einsum("pw,owc->opc", mw, y)


# path-substring -> SFTGAN category id (reference LRHR_seg_bg:108-123)
_SEG_CATEGORIES = (
    "building", "plant", "mountain", "water", "sky", "grass", "animal"
)


class LRHRSegBGDataset:
    """HR image + 8-channel segmentation probability map + background
    scene pool (reference LRHR_seg_bg_dataset.py:8-148).

    * every ``ratio``-th train sample draws from ``dataroot_GT_bg`` with an
      all-background seg map (ref :46-53);
    * LR generated on the fly with MATLAB bicubic after a random scale
      from {1, .9, .8, .7, .6, .5} (ref :71-89);
    * seg maps live next to the images with ``/img/ -> /bicseg/`` and
      ``.png -> .pth`` substitutions (ref :57) — a ``.npy`` twin is also
      accepted; when neither exists the map degrades to all-background.
    """

    def __init__(self, opt):
        self.opt = opt
        self.is_train = opt["phase"] == "train"
        self.paths_HR = _list_images(opt["dataroot_GT"])
        self.paths_LR = (
            _list_images(opt["dataroot_LR"]) if opt["dataroot_LR"] else None
        )
        self.paths_HR_bg = (
            _list_images(opt["dataroot_GT_bg"]) if opt["dataroot_GT_bg"]
            else None
        )
        self.random_scale_list = [1, 0.9, 0.8, 0.7, 0.6, 0.5]
        self.ratio = 10
        self.rng = random.Random()

    def __len__(self):
        return len(self.paths_HR)

    def _load_seg(self, hr_path, shape):
        base = hr_path.replace("/img/", "/bicseg/")
        for ext, loader in ((".npy", self._load_npy), (".pth", self._load_pth)):
            p = os.path.splitext(base)[0] + ext
            if os.path.exists(p):
                seg = loader(p)
                if seg is not None:
                    return np.transpose(seg, (1, 2, 0)).astype(np.float32)
        seg = np.zeros((shape[0], shape[1], 8), np.float32)
        seg[..., 0] = 1.0  # background
        return seg

    @staticmethod
    def _load_npy(p):
        return np.load(p)

    @staticmethod
    def _load_pth(p):
        try:
            import torch

            return torch.load(p, map_location="cpu").numpy()
        except Exception:  # noqa: BLE001 - torch optional on host
            return None

    def __getitem__(self, index):
        scale = self.opt["scale"] or 4
        hr_size = self.opt["HR_size"] or self.opt["GT_size"] or 128
        lr_path = None

        if (self.is_train and self.paths_HR_bg
                and self.rng.randrange(self.ratio) == 0):
            hr_path = self.rng.choice(self.paths_HR_bg)
            img_hr = util.read_img(hr_path)
            seg = np.zeros((img_hr.shape[0], img_hr.shape[1], 8), np.float32)
            seg[..., 0] = 1.0
            category = 0
        else:
            hr_path = self.paths_HR[index]
            img_hr = util.read_img(hr_path)
            seg = self._load_seg(hr_path, img_hr.shape)
            category = 0
            for ci, name in enumerate(_SEG_CATEGORIES):
                if name in hr_path:
                    category = ci + 1
                    break

        if not self.is_train:
            img_hr = util.modcrop(img_hr, 8)
            seg = seg[: img_hr.shape[0], : img_hr.shape[1]]
            category = -1

        if self.paths_LR:
            lr_path = self.paths_LR[index]
            img_lr = util.read_img(lr_path)
        else:
            if self.is_train:
                rs = self.rng.choice(self.random_scale_list)

                def _mod(n):
                    r = (int(n * rs) // scale) * scale
                    return hr_size if r < hr_size else r

                hs, ws = _mod(seg.shape[0]), _mod(seg.shape[1])
                img_hr = cv2.resize(img_hr, (ws, hs),
                                    interpolation=cv2.INTER_LINEAR)
                seg = cv2.resize(seg, (ws, hs),
                                 interpolation=cv2.INTER_NEAREST)
            img_lr = imresize_matlab_np(img_hr, 1.0 / scale)

        if self.is_train:
            lr_size = hr_size // scale
            H, W, _ = img_lr.shape
            rh = self.rng.randint(0, max(0, H - lr_size))
            rw = self.rng.randint(0, max(0, W - lr_size))
            img_lr = img_lr[rh:rh + lr_size, rw:rw + lr_size]
            img_hr = img_hr[rh * scale:rh * scale + hr_size,
                            rw * scale:rw * scale + hr_size]
            seg = seg[rh * scale:rh * scale + hr_size,
                      rw * scale:rw * scale + hr_size]
            hflip = bool(self.opt["use_flip"]) and self.rng.random() < 0.5
            vflip = bool(self.opt["use_rot"]) and self.rng.random() < 0.5
            rot90 = bool(self.opt["use_rot"]) and self.rng.random() < 0.5
            img_lr = util.augment(img_lr, hflip, vflip, rot90)
            img_hr = util.augment(img_hr, hflip, vflip, rot90)
            seg = util.augment(seg, hflip, vflip, rot90)

        return {
            "LR": np.ascontiguousarray(util.bgr2rgb(img_lr)),
            "HR": np.ascontiguousarray(util.bgr2rgb(img_hr)),
            "seg": np.ascontiguousarray(seg),
            "category": category,
            "LR_path": lr_path or hr_path,
            "HR_path": hr_path,
        }
