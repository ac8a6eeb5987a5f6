"""Packed video dataset: decode-once storage for TPU-rate training.

The LQGTVID PNG tree pays a full PNG decode per frame read; on small hosts
the decoder can't feed a TPU chip running ~10 train steps/s (see
docs/PERF.md "Host data loading"). This is the TPU-native analogue of the
reference's lmdb branch (reference data/util.py:34-55 — pre-decoded uint8
blobs), redesigned as a flat mmap so a frame read is a pure page-cache
slice with zero decode and zero copy beyond the crop itself:

* ``tools/pack_dataset.py`` walks an LQGTVID tree and writes
  ``data.u8`` — every frame as raw uint8 **RGB** HWC, clip-contiguous —
  plus ``index.json`` (clip name, frame count, H, W, byte offset).
* ``LQGTVIDPackedDataset`` mirrors ``LQGTVIDDataset`` semantics exactly
  (temporal sampling rules, one shared (crop, flip, rot) augmentation per
  clip, float32 RGB output) but reads frames by slicing the mmap.

Pixels are stored RGB so the train path never channel-swaps; crop, flip,
rot and the /255 scale commute with the BGR->RGB permutation, so outputs
are bit-identical to the PNG path (pinned by tests/test_packed_dataset.py).
"""

from __future__ import annotations

import json
import os

import cv2
import numpy as np

from . import util
from .datasets import LQGTVIDDataset

INDEX_NAME = "index.json"
DATA_NAME = "data.u8"


def pack_lqgtvid(dataroot: str, data_list: str, out_dir: str,
                 verbose: bool = False) -> dict:
    """Decode an LQGTVID PNG tree once into ``out_dir/data.u8`` +
    ``out_dir/index.json``. Returns the index dict."""
    paths = util.get_vid_paths(dataroot, data_list)
    os.makedirs(out_dir, exist_ok=True)
    clips = []
    offset = 0
    with open(os.path.join(out_dir, DATA_NAME), "wb") as f:
        for frames in paths:
            name = os.path.basename(os.path.dirname(frames[0]))
            h = w = None
            for p in frames:
                bgr = cv2.imread(p, cv2.IMREAD_COLOR)
                if bgr is None:
                    raise FileNotFoundError(p)
                rgb = np.ascontiguousarray(bgr[:, :, ::-1])
                if h is None:
                    h, w = rgb.shape[:2]
                elif rgb.shape[:2] != (h, w):
                    raise ValueError(
                        f"clip {name!r}: frame {p} is {rgb.shape[:2]}, "
                        f"expected {(h, w)} — packed clips must be "
                        "constant-resolution"
                    )
                f.write(rgb.tobytes())
            clips.append({"name": name, "n_frames": len(frames),
                          "h": h, "w": w, "offset": offset})
            offset += len(frames) * h * w * 3
            if verbose:
                print(f"packed {name}: {len(frames)} frames {h}x{w}")
    index = {"format": "selfc_tpu_packed_v1", "layout": "THWC-RGB-uint8",
             "clips": clips, "total_bytes": offset}
    with open(os.path.join(out_dir, INDEX_NAME), "w") as f:
        json.dump(index, f)
    return index


class LQGTVIDPackedDataset(LQGTVIDDataset):
    """``LQGTVIDDataset`` over a packed mmap instead of a PNG tree.

    Config: ``dataroot_GT`` points at the packed directory (holding
    ``data.u8`` + ``index.json``); all other LQGTVID options behave
    identically. The mmap handle is opened lazily per process so the
    dataset pickles cleanly into spawn-based loader workers.

    ``output_uint8: true`` keeps the whole host path in uint8: crop/flip/
    rot are numpy views, the batch collate's stack is the only copy, and
    the ``/255`` float cast happens ON DEVICE in ``feed_data``
    (parallel/mesh.put_frames). Same pixels to 1 ulp (the cast commutes
    with every aug), 4x smaller host->device transfer, and the host never runs a
    float conversion — the op that dominates loader cost on small hosts.
    Requires every clip's frames >= GT_size (no resize path in uint8).
    """

    def __init__(self, opt):
        self.opt = opt
        self.is_train = opt["phase"] == "train"
        root = opt["dataroot_GT"]
        with open(os.path.join(root, INDEX_NAME)) as f:
            self._index = json.load(f)
        self._data_path = os.path.join(root, DATA_NAME)
        clips = sorted(self._index["clips"], key=lambda c: c["name"])
        if not self.is_train and opt["sample_num"] and opt["sample_num"] > 0:
            clips = clips[: opt["sample_num"]]
        self._clips = clips
        # frame "paths" are (clip_idx, frame_idx) tokens so the base
        # class's temporal sampling rules apply unchanged
        self.paths_GT = [
            [(ci, t) for t in range(c["n_frames"])]
            for ci, c in enumerate(clips)
        ]
        self.video_len = opt["video_len"]
        import random

        self.rng = random.Random()
        self._mm = None
        self._u8_out = bool(opt["output_uint8"])
        if self._u8_out and self.is_train:
            gt = opt["GT_size"] or 0
            small = [c["name"] for c in clips if c["h"] < gt or c["w"] < gt]
            if small:
                raise ValueError(
                    "output_uint8 needs every clip >= GT_size (the uint8 "
                    f"path has no resize); too small: {small[:5]}"
                )

    # mmap handles must not cross process boundaries (spawn loaders)
    def __getstate__(self):
        state = self.__dict__.copy()
        state["_mm"] = None
        return state

    def _frame_u8(self, token):
        """One (H, W, 3) uint8 RGB view into the mmap — no decode, no copy."""
        if self._mm is None:
            self._mm = np.memmap(self._data_path, dtype=np.uint8, mode="r")
        ci, t = token
        c = self._clips[ci]
        h, w = c["h"], c["w"]
        start = c["offset"] + t * h * w * 3
        return self._mm[start : start + h * w * 3].reshape(h, w, 3)

    def _frame_name(self, token):
        ci, t = token
        return f"{self._clips[ci]['name']}/im{t + 1}.png"

    def _read_frame(self, token, aug, gt_size):
        u8 = self._frame_u8(token)
        if self._u8_out:
            if self.is_train:
                crop = u8[
                    aug["rnd_h"] : aug["rnd_h"] + gt_size,
                    aug["rnd_w"] : aug["rnd_w"] + gt_size,
                ]
                # views only; the collate stack is the single copy
                return util.augment(crop, aug["hflip"], aug["vflip"],
                                    aug["rot90"])
            if self.opt["use_multi_scale"]:
                img = u8.astype(np.float32) / 255.0
                H, W, _ = img.shape
                return np.ascontiguousarray(cv2.resize(
                    img, (W // 2, H // 2), interpolation=cv2.INTER_LINEAR))
            return u8
        if self.is_train:
            H, W, _ = u8.shape
            if H < gt_size or W < gt_size:
                # rare small-frame path: match the PNG route's float resize
                img = u8.astype(np.float32) / 255.0
                img = cv2.resize(img, (gt_size, gt_size),
                                 interpolation=cv2.INTER_LINEAR)
            else:
                # crop on uint8 (copies only the crop's bytes off the mmap)
                img = u8[
                    aug["rnd_h"] : aug["rnd_h"] + gt_size,
                    aug["rnd_w"] : aug["rnd_w"] + gt_size,
                ].astype(np.float32) / 255.0
            img = util.augment(img, aug["hflip"], aug["vflip"], aug["rot90"])
        elif self.opt["use_multi_scale"]:
            img = u8.astype(np.float32) / 255.0
            H, W, _ = img.shape
            img = cv2.resize(img, (W // 2, H // 2),
                             interpolation=cv2.INTER_LINEAR)
        else:
            img = u8.astype(np.float32) / 255.0
        return np.ascontiguousarray(img)

    def __getitem__(self, index):
        frames = self.paths_GT[index % len(self.paths_GT)]
        gt_size = self.opt["GT_size"]
        sel = self._select_frames(frames)
        if self.is_train:
            c = self._clips[sel[0][0]]
            aug = self._gen_aug(c["h"], c["w"], gt_size)
        else:
            aug = None
        clip = np.stack([self._read_frame(t, aug, gt_size) for t in sel],
                        axis=0)
        name = self._frame_name(frames[0])
        return {"GT": clip, "LQ_path": name, "GT_path": name}
