"""BPG (HEVC-intra) per-image codec bridge.

Reference Quantization_BPG (Quantization_BPG.py:18-92): encode each frame
with ``bpgenc -q q``, decode with ``bpgdec``, accumulate bits-per-pixel;
straight-through gradient. Host-side (the TPU graph is split around it,
like the H.265 span). Gated on the binaries being installed.
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


def bpg_roundtrip(frames: np.ndarray, q: int = 29):
    """frames: (N,H,W,3) float [0,1] -> (decoded, bpp)."""
    if not bpg_available():
        # stand-in: 8-bit quantization, synthetic bpp
        dec = (np.clip(frames, 0, 1) * 255.0).round() / 255.0
        return dec.astype(np.float32), 8.0 / max(1.0, q / 4.0)
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
    bpp = total_bits / (n * h * w)
    return np.stack(outs, axis=0), bpp
