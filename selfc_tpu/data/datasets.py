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
        return len(self.paths_GT)

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
        frames = self.paths_GT[index]
        gt_size = self.opt["GT_size"]
        sel = self._select_frames(frames)
        if self.is_train:
            first = util.read_img(sel[0])
            aug = self._gen_aug(first.shape[0], first.shape[1], gt_size)
        else:
            aug = None
        clip = np.stack([self._read_frame(p, aug, gt_size) for p in sel], axis=0)
        return {"GT": clip, "LQ_path": frames[0], "GT_path": frames[0]}


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
