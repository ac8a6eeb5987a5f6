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

TPU-serving structure on top of the reference semantics (round-3):

  * **batched tiles** — the reference runs the width halves / 2x2 tiles
    as separate GPU calls; the tiles are independent and identically
    shaped, so they fold into the BATCH axis of one encode / one decode
    call (same trick as rescaling's val.gop_batch). Convolutions never
    cross the batch axis, so this is numerically identical per tile.
  * **segment grouping** (``seg_batch``) — G segments batch into one
    call; the temporal receptive field is bounded per segment (that is
    what makes the reference's tiling valid at all), so segments are
    independent too. 34 segments x 6 calls collapse to ceil(34/G) x 2
    calls — each dispatch costs ~30 ms on a tunneled chip.
  * **overlap** — the host x265 write of group i runs while the device
    encodes group i+1 (dispatch is async; the np.asarray readback of the
    previous group is deferred until after the next group is enqueued).
    Same structure on the decode side.

Everything defaults ON; ``batch_tiles=False, seg_batch=1, overlap=False``
restores the reference's strictly serial call pattern (used by the perf
comparison and the equivalence tests).
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


def _group_indices(n_seg: int, G: int):
    """Yield (list_of_segment_indices, n_real) per call, the last group
    padded by repeating its final segment so every call compiles once."""
    for s in range(0, n_seg, G):
        idx = list(range(s, min(s + G, n_seg)))
        n_real = len(idx)
        idx += [idx[-1]] * (G - n_real)
        yield idx, n_real


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
    batch_tiles: bool = True,
    seg_batch: int = 1,
    overlap: bool = True,
    stand_in: str | None = None,
):
    """Full streaming compression roundtrip.

    encode_fn(chunk (B,seg,H,W,3)) -> latent (B,seg,h,w,C) [jitted device fn]
    decode_fn(lr_tile (B,seg,hd,wd,3)) -> hr tile (B,seg,hd*s,wd*s,3)
    Returns (lr_decoded (B,T,h,w,3), hr (B,T,H,W,3), video_bpp).

    With ``batch_tiles`` the width halves (encode) / 2x2 tiles (decode)
    ride the batch axis of one call; ``seg_batch`` additionally groups
    that many segments per call; ``overlap`` defers each group's readback
    until the next group is enqueued so host codec I/O and device compute
    overlap. All three preserve per-tile numerics (batch entries are
    independent); decode sampling draws one PRNG key per *call*, so the
    sampled-noise stream regroups with seg_batch (statistically
    equivalent; deterministic priors are unaffected).
    """
    B, T, H, W, _ = video.shape
    segs, pad = seg_add_pad(video, seg_len)
    n_seg = segs.shape[1]
    dw, dh = divide_width_num, divide_height_num
    G = max(1, int(seg_batch)) if batch_tiles else 1

    stream = make_stream(q, keyint, scale, h265_all_default,
                         stand_in=stand_in)
    stream.open_writer(W // scale, H // scale)

    wd = W // dw

    def _write_lr(y_seg):
        """y_seg: latent (B, seg, h, w, C) of ONE segment -> stream."""
        lr = y_seg[..., :3]
        stream.write_multi_frames(
            lr.reshape(B * seg_len, H // scale, W // scale, 3)
        )

    if not batch_tiles:
        # reference-shaped serial loop: one call per (segment, width half)
        for si in range(n_seg):
            chunk = segs[:, si]  # (B, seg, H, W, 3)
            outs = [
                np.asarray(encode_fn(chunk[:, :, :, i * wd : (i + 1) * wd]))
                for i in range(dw)
            ]
            _write_lr(np.concatenate(outs, axis=3))
    else:
        pending = None  # (n_real, device_latents)

        def _flush_encode(p):
            n_real, y_dev = p
            y = np.asarray(y_dev)  # (G*dw*B, seg, h, wl, C)
            y = y.reshape(G, dw * B, *y.shape[1:])
            for g in range(n_real):
                halves = y[g].reshape(dw, B, *y.shape[2:])
                _write_lr(np.concatenate(list(halves), axis=3))

        for idx, n_real in _group_indices(n_seg, G):
            parts = [
                segs[:, si, :, :, i * wd : (i + 1) * wd]
                for si in idx
                for i in range(dw)
            ]
            y_dev = encode_fn(np.concatenate(parts, axis=0))
            if pending is not None:
                _flush_encode(pending)  # host write overlaps device encode
            pending = (n_real, y_dev)
            if not overlap:
                _flush_encode(pending)
                pending = None
        if pending is not None:
            _flush_encode(pending)

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
    hd, wdl = h // dh, w // dw
    hr_out = np.empty((B, n_seg, seg_len, H, W, 3), video.dtype)

    if not batch_tiles:
        for si in range(n_seg):
            lr_seg = lr_dec_segs[:, si]  # (B, seg, h, w, 3)
            rows = []
            for ti in range(dh):
                cols = [
                    np.asarray(
                        decode_fn(
                            lr_seg[
                                :, :, ti * hd : (ti + 1) * hd,
                                tj * wdl : (tj + 1) * wdl,
                            ]
                        )
                    )
                    for tj in range(dw)
                ]
                rows.append(np.concatenate(cols, axis=3))
            hr_out[:, si] = np.concatenate(rows, axis=2)
    else:
        pending = None  # (idx, n_real, device_tiles)

        def _flush_decode(p):
            idx, n_real, hr_dev = p
            t = np.asarray(hr_dev)  # (G*dh*dw*B, seg, hd*s, wd*s, 3)
            t = t.reshape(G, dh, dw, B, *t.shape[1:])
            for g in range(n_real):
                rows = [
                    np.concatenate(list(t[g, ti]), axis=3)
                    for ti in range(dh)
                ]
                hr_out[:, idx[g]] = np.concatenate(rows, axis=2)

        for idx, n_real in _group_indices(n_seg, G):
            tiles = [
                lr_dec_segs[
                    :, si, :, ti * hd : (ti + 1) * hd,
                    tj * wdl : (tj + 1) * wdl,
                ]
                for si in idx
                for ti in range(dh)
                for tj in range(dw)
            ]
            hr_dev = decode_fn(np.concatenate(tiles, axis=0))
            if pending is not None:
                _flush_decode(pending)
            pending = (idx, n_real, hr_dev)
            if not overlap:
                _flush_decode(pending)
                pending = None
        if pending is not None:
            _flush_decode(pending)

    hr = seg_remove_pad(hr_out, pad, seg_len)
    return lr_decoded, hr, video_bpp
