"""Host-side H.265 codec bridge (FFmpeg/libx265 over pipes).

The reference shells out to FFmpeg through skvideo pipes
(Quantization_h265_rgb_stream.py:37-162, Quantization_video_compression.py:
9-91). On TPU this span runs on the host CPU between the jitted encode and
decode halves of the pipeline (selfc_tpu/codec/pipeline.py) — the graph is
split at the codec rather than hiding a subprocess inside one jit.

x265 parameter strings match the reference exactly:
  * streaming mode: ``-pix_fmt yuv444p -c:v libx265 -preset veryfast
    -tune zerolatency -x265-params crf=Q:keyint=K:no-info=1``
  * ``h265_all_default``: drop preset/tune (B-frame default mode)
  (reference :72-96). bpp = file_bytes*8 / (h*w*scale^2*frames) (:128-131).

When ffmpeg is not installed, ``NullCodec`` stands in (identity + synthetic
bpp) so pipelines and tests still run; ``ffmpeg_available()`` gates real
parity runs.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import tempfile

import numpy as np


def ffmpeg_available() -> bool:
    return shutil.which("ffmpeg") is not None


def _x265_params(q, keyint) -> str:
    if keyint and keyint > 0:
        return f"crf={q}:keyint={keyint}:no-info=1"
    return f"crf={q}:no-info=1"


class H265Stream:
    """Streaming writer/reader mirroring Quantization_H265_Stream."""

    def __init__(self, q=17, keyint=12, scale_times=2, h265_all_default=False,
                 workdir=None):
        self.q = q
        self.keyint = keyint
        self.scale_times = scale_times
        self.h265_all_default = h265_all_default
        self.workdir = workdir or tempfile.mkdtemp(prefix="selfc_h265_")
        self.video_name = os.path.join(self.workdir, "stream.mkv")
        self.video_frame_num = 0
        self._writer = None
        self._reader = None
        self.w = self.h = None

    # -- writer ---------------------------------------------------------
    def open_writer(self, w: int, h: int):
        if not ffmpeg_available():
            raise RuntimeError("ffmpeg not available")
        self.w, self.h = w, h
        self.video_frame_num = 0
        cmd = [
            "ffmpeg", "-y", "-loglevel", "error",
            "-f", "rawvideo", "-pix_fmt", "rgb24", "-s", f"{w}x{h}",
            "-i", "pipe:0",
            "-pix_fmt", "yuv444p", "-c:v", "libx265",
        ]
        if not self.h265_all_default:
            cmd += ["-preset", "veryfast", "-tune", "zerolatency"]
        cmd += ["-x265-params", _x265_params(self.q, self.keyint), self.video_name]
        self._writer = subprocess.Popen(cmd, stdin=subprocess.PIPE)

    def write_multi_frames(self, frames: np.ndarray):
        """frames: (N, H, W, 3) float [0,1] RGB — uint8-rounded like the
        reference (:97-107)."""
        u8 = np.clip(frames, 0.0, 1.0)
        u8 = (u8 * 255.0).round().astype(np.uint8)
        self._writer.stdin.write(u8.tobytes())
        self.video_frame_num += len(u8)

    def close_writer(self) -> float:
        self._writer.stdin.close()
        self._writer.wait()
        file_size = os.path.getsize(self.video_name)
        bpp = (
            file_size * 8.0
            / (self.h * self.w * self.scale_times ** 2 * self.video_frame_num)
        )
        return bpp

    # -- reader ---------------------------------------------------------
    def open_reader(self):
        cmd = [
            "ffmpeg", "-loglevel", "error", "-i", self.video_name,
            "-f", "rawvideo", "-pix_fmt", "rgb24", "pipe:1",
        ]
        self._reader = subprocess.Popen(cmd, stdout=subprocess.PIPE)

    def read_multi_frames(self, num: int) -> np.ndarray:
        nbytes = self.h * self.w * 3
        frames = []
        for _ in range(num):
            buf = self._reader.stdout.read(nbytes)
            if not buf or len(buf) < nbytes:
                break
            a = np.frombuffer(buf, np.uint8).reshape(self.h, self.w, 3)
            frames.append(a.astype(np.float32) / 255.0)
        return np.stack(frames, axis=0) if frames else np.zeros((0, self.h, self.w, 3), np.float32)

    def close_reader(self):
        if self._reader is not None:
            self._reader.stdout.close()
            self._reader.wait()
            self._reader = None


def encode_decode_clip(frames: np.ndarray, q, keyint, scale_times,
                       h265_all_default=False):
    """One-shot clip encode+decode (the reference's train-time
    Quantization_H265, Quantization_video_compression.py:9-91).
    frames: (N,H,W,3) [0,1]. Returns (decoded, bpp)."""
    n, h, w, _ = frames.shape
    s = H265Stream(q, keyint, scale_times, h265_all_default)
    s.open_writer(w, h)
    s.write_multi_frames(frames)
    bpp = s.close_writer()
    s.open_reader()
    out = s.read_multi_frames(n)
    s.close_reader()
    return out, bpp


class NullCodec:
    """Stand-in codec when ffmpeg is absent: 8-bit quantization + a
    synthetic bpp derived from the quantized entropy proxy. Keeps the
    pipeline runnable in codec-less environments (tests, CI)."""

    def __init__(self, q=17, keyint=12, scale_times=2, h265_all_default=False,
                 workdir=None):
        self.q = q
        self.scale_times = scale_times
        self._frames = []
        self.w = self.h = None
        self.video_frame_num = 0

    def open_writer(self, w, h):
        self.w, self.h = w, h
        self._frames = []
        self.video_frame_num = 0

    def write_multi_frames(self, frames):
        u8 = (np.clip(frames, 0, 1) * 255.0).round().astype(np.uint8)
        self._frames.append(u8)
        self.video_frame_num += len(u8)

    def close_writer(self):
        # crude bpp proxy: higher q -> fewer bits
        return 8.0 / (self.scale_times ** 2) / max(1.0, self.q / 4.0)

    def open_reader(self):
        self._all = np.concatenate(self._frames, axis=0)
        self._pos = 0

    def read_multi_frames(self, num):
        out = self._all[self._pos : self._pos + num]
        self._pos += num
        return out.astype(np.float32) / 255.0

    def close_reader(self):
        pass


def make_stream(q, keyint, scale_times, h265_all_default=False,
                stand_in: str | None = None):
    """Real x265 stream when ffmpeg exists; otherwise the configured
    stand-in: ``zlib`` = ZlibCodec (REAL bitstream, measured bpp — see
    codec/standin.py), anything else = NullCodec (identity readback,
    formula bpp). ``stand_in`` defaults from $SELFC_TPU_STANDIN_CODEC."""
    if ffmpeg_available():
        return H265Stream(q, keyint, scale_times, h265_all_default)
    if stand_in is None:
        stand_in = os.environ.get("SELFC_TPU_STANDIN_CODEC", "null")
    if str(stand_in).lower() == "zlib":
        from .standin import ZlibCodec

        return ZlibCodec(q, keyint, scale_times, h265_all_default)
    return NullCodec(q, keyint, scale_times, h265_all_default)
