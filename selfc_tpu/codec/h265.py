"""Host-side H.265 codec bridge (libx265 over pipes).

The reference shells out to FFmpeg through skvideo pipes
(Quantization_h265_rgb_stream.py:37-162, Quantization_video_compression.py:
9-91). On TPU this span runs on the host CPU between the jitted encode and
decode halves of the pipeline (selfc_tpu/codec/pipeline.py) — the graph is
split at the codec rather than hiding a subprocess inside one jit.

Two interchangeable real-x265 backends:
  * the ``ffmpeg`` CLI, when installed (byte-exact match to the
    reference's skvideo invocation), or
  * ``selfc_x265`` — our native C++ tool (selfc_tpu/native/selfc_x265.cpp)
    linked against the system libavcodec/libswscale/libx265, for images
    that ship the ffmpeg *libraries* but no CLI. Same conversion path
    (swscale rgb24<->yuv444p), same encoder, same Matroska container, so
    the file-size bpp accounting matches the reference's.

x265 parameter strings match the reference exactly:
  * streaming mode: ``-pix_fmt yuv444p -c:v libx265 -preset veryfast
    -tune zerolatency -x265-params crf=Q:keyint=K:no-info=1``
  * ``h265_all_default``: drop preset/tune (B-frame default mode)
  (reference :72-96). bpp = file_bytes*8 / (h*w*scale^2*frames) (:128-131).

When no real backend exists, ``make_stream`` falls back to the measured-rate
``ZlibCodec`` stand-in (codec/standin.py); the formula-rate ``NullCodec``
requires an explicit opt-in. Every stream carries ``bpp_source`` so rate
log lines can stamp their provenance.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import tempfile

import numpy as np

_NATIVE_SRC = os.path.join(os.path.dirname(__file__), "..", "native")


def _native_binary() -> str | None:
    """Path to the selfc_x265 tool, building it on first use if the
    source tree and toolchain are present."""
    env = os.environ.get("SELFC_X265")
    if env and os.path.exists(env):
        return env
    binpath = os.path.abspath(os.path.join(_NATIVE_SRC, "bin", "selfc_x265"))
    if os.path.exists(binpath):
        return binpath
    src = os.path.join(_NATIVE_SRC, "selfc_x265.cpp")
    if os.path.exists(src) and shutil.which("make"):
        try:
            subprocess.run(["make", "-C", os.path.abspath(_NATIVE_SRC)],
                           capture_output=True, timeout=120, check=True)
        except Exception:
            return None
        if os.path.exists(binpath):
            return binpath
    return None


_BACKEND_CACHE: list = []


def codec_backend() -> str | None:
    """'ffmpeg' | 'native' | None — the real-x265 backend in use.

    SELFC_TPU_DISABLE_X265=1 forces None: parity harnesses that pin a
    bit-identical torch twin of a stand-in codec (tools/
    parity_compression.py) use it to run the stand-in on both stacks
    even though a real backend exists."""
    if os.environ.get("SELFC_TPU_DISABLE_X265"):
        return None
    if not _BACKEND_CACHE:
        if shutil.which("ffmpeg"):
            _BACKEND_CACHE.append("ffmpeg")
        else:
            binpath = _native_binary()
            ok = False
            if binpath:
                try:
                    ok = subprocess.run([binpath, "probe"], capture_output=True,
                                        timeout=30).returncode == 0
                except Exception:
                    ok = False
            _BACKEND_CACHE.append("native" if ok else None)
    return _BACKEND_CACHE[0]


def ffmpeg_available() -> bool:
    """True when a REAL x265 encode/decode path exists (ffmpeg CLI or the
    native selfc_x265 tool). Name kept for API compatibility."""
    return codec_backend() is not None


def _x265_params(q, keyint) -> str:
    if keyint and keyint > 0:
        return f"crf={q}:keyint={keyint}:no-info=1"
    return f"crf={q}:no-info=1"


class H265Stream:
    """Streaming writer/reader mirroring Quantization_H265_Stream."""

    bpp_source = "x265"

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
        backend = codec_backend()
        if backend is None:
            raise RuntimeError("no real x265 backend (ffmpeg CLI or selfc_x265)")
        self.w, self.h = w, h
        self.video_frame_num = 0
        if backend == "ffmpeg":
            cmd = [
                "ffmpeg", "-y", "-loglevel", "error",
                "-f", "rawvideo", "-pix_fmt", "rgb24", "-s", f"{w}x{h}",
                "-i", "pipe:0",
                "-pix_fmt", "yuv444p", "-c:v", "libx265",
            ]
            if not self.h265_all_default:
                cmd += ["-preset", "veryfast", "-tune", "zerolatency"]
            cmd += ["-x265-params", _x265_params(self.q, self.keyint),
                    self.video_name]
        else:
            cmd = [_native_binary(), "encode", "--size", f"{w}x{h}",
                   "--x265-params", _x265_params(self.q, self.keyint)]
            if self.h265_all_default:
                cmd += ["--all-default"]
            else:
                cmd += ["--preset", "veryfast", "--tune", "zerolatency"]
            cmd += ["-o", self.video_name]
        self._writer = subprocess.Popen(cmd, stdin=subprocess.PIPE,
                                        stderr=subprocess.DEVNULL)

    def write_multi_frames(self, frames: np.ndarray):
        """frames: (N, H, W, 3) float [0,1] RGB — uint8-rounded like the
        reference (:97-107)."""
        u8 = np.clip(frames, 0.0, 1.0)
        u8 = (u8 * 255.0).round().astype(np.uint8)
        self._writer.stdin.write(u8.tobytes())
        self.video_frame_num += len(u8)

    def close_writer(self) -> float:
        self._writer.stdin.close()
        rc = self._writer.wait()
        if rc != 0 or not os.path.exists(self.video_name):
            raise RuntimeError(
                f"x265 encoder failed (rc={rc}) for {self.w}x{self.h}; "
                "note x265 requires frames of at least 16x16 — tiny-shape "
                "pipeline tests should set SELFC_TPU_DISABLE_X265=1 and "
                "use a stand-in codec"
            )
        file_size = os.path.getsize(self.video_name)
        bpp = (
            file_size * 8.0
            / (self.h * self.w * self.scale_times ** 2 * self.video_frame_num)
        )
        return bpp

    # -- reader ---------------------------------------------------------
    def open_reader(self):
        if codec_backend() == "ffmpeg":
            cmd = [
                "ffmpeg", "-loglevel", "error", "-i", self.video_name,
                "-f", "rawvideo", "-pix_fmt", "rgb24", "pipe:1",
            ]
        else:
            cmd = [_native_binary(), "decode", "-i", self.video_name]
        self._reader = subprocess.Popen(cmd, stdout=subprocess.PIPE,
                                        stderr=subprocess.DEVNULL)

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
    """Stand-in codec of last resort: 8-bit quantization + a content-
    INDEPENDENT formula bpp. Only used on explicit opt-in
    (stand_in='null'); the default codec-less stand-in is the
    measured-rate ZlibCodec. Rate lines from this codec must be stamped
    ``bpp_source='formula'``."""

    bpp_source = "formula"

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


def rate_source(stand_in: str | None = None) -> str:
    """Provenance tag for bpp numbers under the current codec resolution:
    'x265' (real backend), 'zlib' (measured stand-in bitstream) or
    'formula' (NullCodec's content-independent number). Every log line
    that prints a bpp must carry this tag."""
    if ffmpeg_available():
        return "x265"
    if stand_in is None:
        stand_in = os.environ.get("SELFC_TPU_STANDIN_CODEC", "zlib")
    return "formula" if str(stand_in).lower() == "null" else "zlib"


def make_stream(q, keyint, scale_times, h265_all_default=False,
                stand_in: str | None = None):
    """Real x265 stream when a backend exists (ffmpeg CLI or the native
    selfc_x265 tool); otherwise the configured stand-in. The DEFAULT
    stand-in is ``zlib`` (ZlibCodec: real bitstream, measured bpp — see
    codec/standin.py); the formula-rate NullCodec requires an explicit
    ``stand_in='null'`` opt-in so no code path silently emits a
    content-independent bpp. ``stand_in`` defaults from
    $SELFC_TPU_STANDIN_CODEC."""
    if ffmpeg_available():
        return H265Stream(q, keyint, scale_times, h265_all_default)
    if stand_in is None:
        stand_in = os.environ.get("SELFC_TPU_STANDIN_CODEC", "zlib")
    if str(stand_in).lower() == "null":
        return NullCodec(q, keyint, scale_times, h265_all_default)
    from .standin import ZlibCodec

    return ZlibCodec(q, keyint, scale_times, h265_all_default)
