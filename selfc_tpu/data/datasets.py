"""Video clip datasets (host-side, numpy).

``LQGTVIDDataset`` mirrors the reference LQGTVID_dataset.py:13-232 — the
dataset used by every shipped config: per-video frame lists, one shared
(crop, flip, rot) augmentation per clip, temporal sampling rules keyed on
video_len, output clip ``GT`` as channels-last float32 RGB ``(T, H, W, 3)``.

Unlike the reference there is NO process-global state: T rides with the
array shape into jit.
"""

from __future__ import annotations

import random

import cv2
import numpy as np

from . import util


class LQGTVIDDataset:
    def __init__(self, opt):
        self.opt = opt
        self.is_train = opt["phase"] == "train"
        self.paths_GT = util.get_vid_paths(opt["dataroot_GT"], opt["dataroot_list"])
        if not self.is_train and opt["sample_num"] and opt["sample_num"] > 0:
            self.paths_GT = self.paths_GT[: opt["sample_num"]]
        self.video_len = opt["video_len"]
        self.rng = random.Random()

    def __len__(self):
        # datasets.train.epoch_ratio virtually inflates the epoch so the
        # loader's per-epoch producer restart happens rarely — the
        # reference's dataset_ratio=200 idea (train.py:171-182), applied
        # at the dataset instead of the (dist-only) sampler. __getitem__
        # indexes modulo the real length; augmentation/temporal sampling
        # are drawn per call, so repeats are fresh samples.
        ratio = (self.opt["epoch_ratio"] or 1) if self.is_train else 1
        return len(self.paths_GT) * max(1, int(ratio))

    # -- temporal sampling (reference :184-214) --------------------------
    def _select_frames(self, frames):
        n = len(frames)
        vl = self.video_len
        if vl == 5 and n > 5 and self.is_train:
            idx = []
            lo = 0
            for k in range(5):
                hi = n - (5 - k)
                i = self.rng.randint(lo, hi)
                idx.append(i)
                lo = i + 1
            return [frames[i] for i in idx]
        if vl == 3 and n > 3:
            i1 = self.rng.randint(0, n - 3)
            i2 = self.rng.randint(i1 + 1, n - 2)
            i3 = self.rng.randint(i2 + 1, n - 1)
            return [frames[i1], frames[i2], frames[i3]]
        if vl:
            return frames[:vl]
        return frames

    def _gen_aug(self, H, W, gt_size):
        return {
            "hflip": bool(self.opt["use_flip"]) and self.rng.random() < 0.5,
            "vflip": bool(self.opt["use_rot"]) and self.rng.random() < 0.5,
            "rot90": bool(self.opt["use_rot"]) and self.rng.random() < 0.5,
            "rnd_h": self.rng.randint(0, max(0, H - gt_size)),
            "rnd_w": self.rng.randint(0, max(0, W - gt_size)),
        }

    def _read_frame(self, path, aug, gt_size):
        img = util.read_img(path)  # BGR [0,1]
        if self.is_train:
            H, W, _ = img.shape
            if H < gt_size or W < gt_size:
                img = cv2.resize(img, (gt_size, gt_size), interpolation=cv2.INTER_LINEAR)
            img = img[
                aug["rnd_h"] : aug["rnd_h"] + gt_size,
                aug["rnd_w"] : aug["rnd_w"] + gt_size,
            ]
            img = util.augment(img, aug["hflip"], aug["vflip"], aug["rot90"])
        elif self.opt["use_multi_scale"]:
            # test-time 0.5x multi-scale mode (reference
            # LQGTVID_dataset.py:135-146 / :44-47)
            H, W, _ = img.shape
            img = cv2.resize(img, (W // 2, H // 2), interpolation=cv2.INTER_LINEAR)
        return np.ascontiguousarray(util.bgr2rgb(img))

    def __getitem__(self, index):
        frames = self.paths_GT[index % len(self.paths_GT)]
        gt_size = self.opt["GT_size"]
        sel = self._select_frames(frames)
        if self.is_train:
            first = util.read_img(sel[0])
            aug = self._gen_aug(first.shape[0], first.shape[1], gt_size)
        else:
            aug = None
        clip = np.stack([self._read_frame(p, aug, gt_size) for p in sel], axis=0)
        return {"GT": clip, "LQ_path": frames[0], "GT_path": frames[0]}


def _elastic_deform_np(img: np.ndarray, rng: np.random.Generator,
                       sigma: float = 12.0, points: int = 3) -> np.ndarray:
    """Random-grid elastic deformation of one (H, W, C) frame — numpy/scipy
    equivalent of elasticdeform.deform_random_grid(axis=(0,1), sigma=12,
    points=3) used by the reference Aug dataset
    (LQGTVID_Aug_dataset.py:115-116): a points x points displacement grid
    drawn N(0, sigma) per axis, spline-upsampled to full resolution, then
    cubic resampling of the image at the displaced coordinates."""
    from scipy.interpolate import RectBivariateSpline
    from scipy.ndimage import map_coordinates

    H, W, C = img.shape
    disp = rng.normal(0.0, sigma, (2, points, points))
    k = min(3, points - 1)
    grid = np.arange(points, dtype=np.float64)
    gy = np.linspace(0, points - 1, H)
    gx = np.linspace(0, points - 1, W)
    dy = RectBivariateSpline(grid, grid, disp[0], kx=k, ky=k)(gy, gx)
    dx = RectBivariateSpline(grid, grid, disp[1], kx=k, ky=k)(gy, gx)
    yy, xx = np.meshgrid(
        np.arange(H, dtype=np.float64), np.arange(W, dtype=np.float64),
        indexing="ij",
    )
    coords = np.stack([yy + dy, xx + dx])
    out = np.stack(
        [
            map_coordinates(img[..., c], coords, order=3, mode="reflect")
            for c in range(C)
        ],
        axis=-1,
    )
    # cubic spline resampling overshoots at sharp edges; frames are [0,1]
    np.clip(out, 0.0, 1.0, out=out)
    return out.astype(img.dtype, copy=False)


class LQGTVIDAugDataset(LQGTVIDDataset):
    """Augmentation-heavy variant (reference LQGTVID_Aug_dataset.py):

    * optional per-clip elastic deformation (``use_elastic_deform``; flag
      shared per clip, a fresh random grid per frame, matching the
      reference's per-frame deform_random_grid call :115-116);
    * ``use_multi_scale`` accepts the reference's random-scale list — NB in
      the reference the drawn ``random_scale`` is never applied in
      read_img (dead value, :60 vs :68-121), so it has no pixel effect
      here either;
    * temporal rules (:149-167): test = all frames; train T=5 = random
      monotone 5 of the first 7; train T=7 = all frames.
    """

    def __init__(self, opt):
        super().__init__(opt)
        self.np_rng = np.random.default_rng(self.rng.randint(0, 2**31 - 1))

    def _select_frames(self, frames):
        if not self.is_train:
            return frames
        n = len(frames)
        if self.video_len == 5 and n >= 7:
            # reference draws monotone indices inside the first 7 frames
            bounds = [(0, 2), (None, 3), (None, 4), (None, 5), (None, 6)]
            idx = []
            lo = 0
            for lo_fixed, hi in bounds:
                lo = lo_fixed if lo_fixed is not None else lo
                i = self.rng.randint(lo, hi)
                idx.append(i)
                lo = i + 1
            return [frames[i] for i in idx]
        if self.video_len == 7:
            return frames
        return super()._select_frames(frames)

    def _gen_aug(self, H, W, gt_size):
        aug = super()._gen_aug(H, W, gt_size)
        aug["elastic"] = (
            bool(self.opt["use_elastic_deform"]) and self.rng.random() < 0.5
        )
        if self.opt["use_multi_scale"]:
            # drawn for parity with the reference's gen_aug_params (:60);
            # the reference never applies it (dead value)
            aug["random_scale"] = self.rng.choice(
                [0.6, 0.8, 1, 1.2, 1.4, 1.6, 1.8, 2]
            )
        return aug

    def _read_frame(self, path, aug, gt_size):
        img = super()._read_frame(path, aug, gt_size)
        if self.is_train and aug.get("elastic"):
            img = _elastic_deform_np(img, self.np_rng)
        return img


class LQGTVIDConsecutiveDataset(LQGTVIDDataset):
    """reference LQGTVID_Conseutive_dataset.py: test = all frames; train
    T=5 fixed indices 1..5."""

    def _select_frames(self, frames):
        if not self.is_train:
            return frames
        if self.video_len == 5 and len(frames) > 5:
            return frames[1:6]
        return super()._select_frames(frames)


def _bd_downsample_np(img: np.ndarray, scale: int) -> np.ndarray:
    """Host-side DUF/BD gaussian downsample of one frame (H,W,C) — numpy
    twin of ops/resize.gaussian_downsample for loader-side LQ generation
    (reference LQGTVID_SR_dataset.py:161 + models/Guassian.py)."""
    import math

    sigma = 0.4 * scale
    radius = min(int(4.0 * sigma + 0.5), 6)
    w = np.zeros(13)
    for i in range(-radius, radius + 1):
        w[6 + i] = math.exp(-0.5 * (i / sigma) ** 2)
    w /= w.sum()
    k2d = np.outer(w, w).astype(np.float32)
    pad = 6 + 2 * scale
    x = np.pad(img, ((pad, pad), (pad, pad), (0, 0)), mode="reflect")
    blurred = cv2.filter2D(x, -1, k2d, borderType=cv2.BORDER_CONSTANT)
    # sample the 13x13 correlation centers at stride `scale`
    c = 6
    y = blurred[c : x.shape[0] - c : scale, c : x.shape[1] - c : scale]
    return np.ascontiguousarray(y[2:-2, 2:-2])


class LQGTVIDSRDataset(LQGTVIDDataset):
    """Adds an on-the-fly BD-downsampled LQ clip
    (reference LQGTVID_SR_dataset.py)."""

    def __getitem__(self, index):
        item = super().__getitem__(index)
        scale = self.opt["scale"] or 4
        lq = np.stack(
            [_bd_downsample_np(f, scale) for f in item["GT"]], axis=0
        )
        item["LQ"] = lq
        return item


class LQGTVIDBicubicDataset(LQGTVIDDataset):
    """Adds a bicubic LQ clip (reference LQGTVID_bicubic_dataset.py)."""

    def __getitem__(self, index):
        item = super().__getitem__(index)
        scale = self.opt["scale"] or 4
        lq = np.stack(
            [
                cv2.resize(
                    f, (f.shape[1] // scale, f.shape[0] // scale),
                    interpolation=cv2.INTER_CUBIC,
                )
                for f in item["GT"]
            ],
            axis=0,
        )
        item["LQ"] = lq
        return item


def pad_clip_to_length(clip: np.ndarray, t_len: int) -> np.ndarray:
    """Repeat the last frame so the clip reaches t_len
    (reference SelfC_model.feed_data, SelfC_model.py:102-109)."""
    t = clip.shape[0]
    if t >= t_len:
        return clip
    pad = np.repeat(clip[-1:], t_len - t, axis=0)
    return np.concatenate([clip, pad], axis=0)
