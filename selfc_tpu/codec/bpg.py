"""BPG (HEVC-intra) per-image codec bridge.

Reference Quantization_BPG (Quantization_BPG.py:18-92): encode each frame
with ``bpgenc -q q``, decode with ``bpgdec``, accumulate bits-per-pixel;
straight-through gradient. Host-side (the TPU graph is split around it,
like the H.265 span).

Backend resolution order (``bpg_backend()``):
  1. ``bpgenc``/``bpgdec`` binaries when installed (the reference's path);
  2. REAL HEVC-intra via the native selfc_x265 bridge: BPG *is* the HEVC
     intra still-picture toolset in a thin container (libbpg wraps an HEVC
     encoder), so encoding each frame as its own single-frame all-intra
     x265 stream (keyint=1) is the same codec with a different wrapper —
     rate is the measured stream size, distortion is the real HEVC intra
     loop. libbpg itself is not in this image and has no package here;
     this mapping keeps the rate REAL instead of falling to a formula.
  3. 8-bit-quantization stand-in with a synthetic bpp (no real backend).
"""

from __future__ import annotations

import os
import shutil
import subprocess
import tempfile

import numpy as np
from PIL import Image


def bpg_available() -> bool:
    return shutil.which("bpgenc") is not None and shutil.which("bpgdec") is not None


def bpg_backend() -> str | None:
    """'bpg' | 'hevc-intra' | None (stand-in)."""
    if bpg_available():
        return "bpg"
    from .h265 import codec_backend

    if codec_backend() is not None:
        return "hevc-intra"
    return None


def _roundtrip_bpgenc(frames: np.ndarray, q: int):
    n, h, w, _ = frames.shape
    total_bits = 0
    outs = []
    with tempfile.TemporaryDirectory(prefix="selfc_bpg_") as d:
        for i in range(n):
            png = os.path.join(d, f"f{i}.png")
            bpg = os.path.join(d, f"f{i}.bpg")
            out = os.path.join(d, f"f{i}_dec.png")
            u8 = (np.clip(frames[i], 0, 1) * 255.0).round().astype(np.uint8)
            Image.fromarray(u8).save(png)
            subprocess.run(["bpgenc", "-q", str(q), "-o", bpg, png], check=True)
            total_bits += os.path.getsize(bpg) * 8
            subprocess.run(["bpgdec", "-o", out, bpg], check=True)
            dec = np.asarray(Image.open(out), np.float32) / 255.0
            outs.append(dec[..., :3])
    return np.stack(outs, axis=0), total_bits / (n * h * w)


def _roundtrip_hevc_intra(frames: np.ndarray, q: int):
    """Each frame as its own single-frame all-intra x265 stream — the
    HEVC-intra still-image coding BPG wraps. Measured file-size rate."""
    from .h265 import H265Stream

    n, h, w, _ = frames.shape
    total_bits = 0
    outs = []
    for i in range(n):
        s = H265Stream(q=q, keyint=1, scale_times=1, h265_all_default=False)
        try:
            s.open_writer(w, h)
            s.write_multi_frames(frames[i : i + 1])
            s.close_writer()
            total_bits += os.path.getsize(s.video_name) * 8
            s.open_reader()
            dec = s.read_multi_frames(1)
            s.close_reader()
        finally:
            shutil.rmtree(s.workdir, ignore_errors=True)
        outs.append(np.asarray(dec[0], np.float32))
    return np.stack(outs, axis=0), total_bits / (n * h * w)


def bpg_roundtrip(frames: np.ndarray, q: int = 29):
    """frames: (N,H,W,3) float [0,1] -> (decoded, bpp per coded pixel).

    The caller scales bpp to HR pixels like the reference
    (Quantization_BPG.py:44: file_size*8/(h*w*scale^2))."""
    backend = bpg_backend()
    if backend == "bpg":
        return _roundtrip_bpgenc(frames, q)
    if backend == "hevc-intra":
        return _roundtrip_hevc_intra(frames, q)
    # stand-in: 8-bit quantization, synthetic bpp
    dec = (np.clip(frames, 0, 1) * 255.0).round() / 255.0
    return dec.astype(np.float32), 8.0 / max(1.0, q / 4.0)
