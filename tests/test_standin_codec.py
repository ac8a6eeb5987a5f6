"""ZlibCodec: the measured-rate ffmpeg-less stand-in (codec/standin.py).

Unlike NullCodec's constant-formula bpp, these rates are byte counts of a
real entropy-coded bitstream the decoder actually reads back — so we can
pin codec properties the reference gets from x265 (rate responds to q and
to content; decoder reconstructs exactly what the encoder quantized)."""

import numpy as np
import pytest

from selfc_tpu.codec.pipeline import compress_video
from selfc_tpu.codec.standin import ZlibCodec, q_to_step, zlib_encode_decode_clip


def _clip(seed=0, n=9, h=16, w=16):
    rng = np.random.default_rng(seed)
    base = rng.random((1, h, w, 3)).astype(np.float32)
    # temporally correlated frames: codec delta coding has something to win
    frames = [base[0]]
    for _ in range(n - 1):
        frames.append(
            np.clip(frames[-1] + 0.02 * rng.standard_normal((h, w, 3)), 0, 1)
        )
    return np.stack(frames).astype(np.float32)


class TestZlibCodec:
    @pytest.fixture(autouse=True)
    def _force_standin(self, monkeypatch):
        # pin the ZlibCodec branch even on hosts with a real x265 backend
        # (compress_video/h265_host_roundtrip prefer real x265 otherwise)
        monkeypatch.setenv("SELFC_TPU_DISABLE_X265", "1")

    def test_roundtrip_is_exact_quantization(self):
        """Decoder output == encoder's quantized frames, bit-exactly,
        across intra/delta frames (keyint=4 inside a 9-frame clip)."""
        frames = _clip()
        c = ZlibCodec(q=17, keyint=4, scale_times=2)
        c.open_writer(16, 16)
        c.write_multi_frames(frames)
        bpp = c.close_writer()
        c.open_reader()
        out = c.read_multi_frames(9)
        c.close_reader()
        assert bpp > 0
        u8 = (frames * 255.0).round().astype(np.uint8)
        s = q_to_step(17)
        expect = np.minimum((u8 // s) * s + s // 2, 255).astype(np.uint8)
        np.testing.assert_array_equal((out * 255.0).round().astype(np.uint8),
                                      expect)

    def test_rate_monotone_in_q(self):
        frames = _clip(1)
        bpps = [zlib_encode_decode_clip(frames, q, 4, 2)[1]
                for q in (9, 17, 29)]
        assert bpps[0] > bpps[1] > bpps[2] > 0

    def test_rate_responds_to_content(self):
        """Constant frames must cost (much) less than random noise —
        the NullCodec formula can't tell them apart."""
        flat = np.full((6, 16, 16, 3), 0.5, np.float32)
        noise = np.random.default_rng(2).random((6, 16, 16, 3)).astype(
            np.float32
        )
        bpp_flat = zlib_encode_decode_clip(flat, 17, 4, 2)[1]
        bpp_noise = zlib_encode_decode_clip(noise, 17, 4, 2)[1]
        assert bpp_noise > 4 * bpp_flat

    def test_distortion_shrinks_with_q(self):
        frames = _clip(3)
        errs = []
        for q in (9, 29):
            out, _ = zlib_encode_decode_clip(frames, q, 4, 2)
            errs.append(float(np.mean(np.abs(out - frames))))
        assert errs[0] < errs[1]  # lower q -> finer step -> less error

    def test_pipeline_batched_equals_serial_with_zlib(self):
        """compress_video(stand_in='zlib'): the batched/overlapped call
        structure must leave the bitstream and outputs identical to the
        serial loop (frames reach the writer in the same order)."""
        def encode_fn(chunk):
            c = np.asarray(chunk, np.float32)
            return 0.25 * (c[:, :, ::2, ::2] + c[:, :, 1::2, ::2]
                           + c[:, :, ::2, 1::2] + c[:, :, 1::2, 1::2])

        def decode_fn(tile):
            t = np.asarray(tile, np.float32)
            return np.repeat(np.repeat(t, 2, axis=2), 2, axis=3)

        video = np.random.default_rng(7).random((1, 7, 16, 16, 3)).astype(
            np.float32
        )
        base = compress_video(encode_fn, decode_fn, video, 17, 12, 2,
                              batch_tiles=False, seg_batch=1, overlap=False,
                              stand_in="zlib")
        got = compress_video(encode_fn, decode_fn, video, 17, 12, 2,
                             batch_tiles=True, seg_batch=2, overlap=True,
                             stand_in="zlib")
        np.testing.assert_allclose(base[0], got[0], atol=1e-6)
        np.testing.assert_allclose(base[1], got[1], atol=1e-6)
        assert base[2] == pytest.approx(got[2])
        assert base[2] > 0

    def test_host_roundtrip_stand_in(self):
        """Train-path h265_host_roundtrip(stand_in='zlib') logs a measured
        (non-zero) img_bpp in ffmpeg-less environments."""
        from selfc_tpu.codec.h265 import ffmpeg_available
        from selfc_tpu.codec.surrogate import h265_host_roundtrip

        if ffmpeg_available():
            pytest.skip("real ffmpeg present; stand-in branch not taken")
        lr = _clip(4, n=3)[None]  # (B=1, T=3, h, w, 3)
        dec, bpp = h265_host_roundtrip(lr, 17, 3, 2, stand_in="zlib")
        assert dec.shape == lr.shape
        assert bpp > 0
        assert np.mean(np.abs(dec - lr)) < 0.05
