"""Test-time codec streaming pipeline.

Reproduces the reference's CPU-resident streaming eval
(SelfC_Codec_arch_inv.forward_test, SelfC_Codec_arch_inv.py:502-640):

  * pad T to a multiple of Seg_Len=3 by repeating the second-to-last frame
    (seg_add_pad, utils/util.py:329-345),
  * ENCODE per segment on device with the width split in half (:537-542),
    write quantized LR frames into one live x265 stream,
  * close the stream -> file-size bpp, re-read decoded LR frames,
  * DECODE per segment with 2x2 spatial tiling (:594-624).

The full video stays on the host; only one segment's tensors live on
device — the graph is split at the codec instead of hiding the subprocess
inside jit. Device halves are jitted once per (segment, tile) shape.
"""

from __future__ import annotations

import numpy as np

from .h265 import make_stream


def seg_add_pad(video: np.ndarray, seg_len: int):
    """(B,T,...) -> (B, n_seg, seg_len, ...), pad count. Pads by repeating
    the second-to-last frame (reference utils/util.py:341-342)."""
    B, T = video.shape[:2]
    pad = (seg_len - T % seg_len) % seg_len
    if pad:
        filler = np.repeat(video[:, -2:-1], pad, axis=1)
        video = np.concatenate([video, filler], axis=1)
    n_seg = video.shape[1] // seg_len
    return video.reshape(B, n_seg, seg_len, *video.shape[2:]), pad


def seg_remove_pad(video: np.ndarray, pad: int, seg_len: int):
    """(B, n_seg, seg_len, ...) -> (B, T, ...)."""
    B, n_seg = video.shape[:2]
    flat = video.reshape(B, n_seg * seg_len, *video.shape[3:])
    if pad:
        flat = flat[:, : n_seg * seg_len - pad]
    return flat


def compress_video(
    encode_fn,
    decode_fn,
    video: np.ndarray,
    q,
    keyint,
    scale: int,
    h265_all_default: bool = False,
    seg_len: int = 3,
    divide_width_num: int = 2,
    divide_height_num: int = 2,
):
    """Full streaming compression roundtrip.

    encode_fn(chunk (B,seg,H,W,3)) -> latent (B,seg,h,w,C) [jitted device fn]
    decode_fn(lr_tile (B,seg,hd,wd,3)) -> hr tile (B,seg,hd*s,wd*s,3)
    Returns (lr_decoded (B,T,h,w,3), hr (B,T,H,W,3), video_bpp).
    """
    B, T, H, W, _ = video.shape
    segs, pad = seg_add_pad(video, seg_len)
    n_seg = segs.shape[1]

    stream = make_stream(q, keyint, scale, h265_all_default)
    stream.open_writer(W // scale, H // scale)
    for si in range(n_seg):
        chunk = segs[:, si]  # (B, seg, H, W, 3)
        outs = []
        wd = W // divide_width_num
        for i in range(divide_width_num):
            part = chunk[:, :, :, i * wd : (i + 1) * wd]
            outs.append(np.asarray(encode_fn(part)))
        y = np.concatenate(outs, axis=3)
        lr = y[..., :3]
        stream.write_multi_frames(
            lr.reshape(B * seg_len, H // scale, W // scale, 3)
        )
    video_bpp = stream.close_writer()

    stream.open_reader()
    decoded = []
    for si in range(n_seg):
        fr = stream.read_multi_frames(B * seg_len)
        decoded.append(fr.reshape(B, seg_len, H // scale, W // scale, 3))
    stream.close_reader()
    lr_dec_segs = np.stack(decoded, axis=1)  # (B, n_seg, seg, h, w, 3)
    lr_decoded = seg_remove_pad(lr_dec_segs, pad, seg_len)

    h, w = H // scale, W // scale
    hd, wd = h // divide_height_num, w // divide_width_num
    hr_segs = []
    for si in range(n_seg):
        lr_seg = lr_dec_segs[:, si]  # (B, seg, h, w, 3)
        rows = []
        for ti in range(divide_height_num):
            cols = []
            for tj in range(divide_width_num):
                tile = lr_seg[:, :, ti * hd : (ti + 1) * hd, tj * wd : (tj + 1) * wd]
                cols.append(np.asarray(decode_fn(tile)))
            rows.append(np.concatenate(cols, axis=3))
        hr_segs.append(np.concatenate(rows, axis=2))
    hr_segs = np.stack(hr_segs, axis=1)
    hr = seg_remove_pad(hr_segs, pad, seg_len)
    return lr_decoded, hr, video_bpp
