"""Mesh-parallel EVAL: the batched streaming-eval calls shard their
independent axis-0 entries over the dp mesh axis (parallel/mesh.py
dp_sharding) — collective-free eval data-parallelism over ICI.

The reference processes these entries strictly serially on one GPU
(codec tiles/segments: SelfC_Codec_arch_inv.py:516-624; rescaling GOPs:
SelfC_model.py:196-250), so the acceptance bar is exact numerical
equality with the serial path, here pinned on a real multi-device
(CPU) mesh.
"""

import jax
import numpy as np
import pytest

from selfc_tpu.config import dict_to_nonedict
from selfc_tpu.parallel.mesh import make_mesh


def _mesh2():
    devs = jax.devices()
    if len(devs) < 2:
        pytest.skip("needs >=2 devices (virtual CPU mesh)")
    return make_mesh(dp=2, sp=1, devices=devs[:2])


def _rescale_opt():
    return dict_to_nonedict({
        "is_train": True, "model": "SelfC_GMM", "distortion": "sr_bd",
        "scale": 4,
        "datasets": {"train": {"video_len": 3, "GT_size": 32}},
        "network_G": {
            "which_model_G": {"subnet_type": "D2DTNet"},
            "in_nc": 3, "out_nc": 3, "block_num": [1, 1], "scale": 4,
            "init": "xavier", "global_module": "nonlocal", "stp_blk_num": 2,
            "fh_loss": "l2",
        },
        "path": {},
        "train": {
            "lr_G": 1e-4, "beta1": 0.9, "beta2": 0.999,
            "lr_scheme": "MultiStepLR", "lr_steps": [], "lr_gamma": 0.5,
            "pixel_criterion_forw": "l2", "pixel_criterion_back": "l1",
            "lambda_fit_forw": 4.0, "lambda_rec_back": 1.0,
            "gradient_clipping": 10.0,
        },
    })


def _codec_opt():
    return dict_to_nonedict({
        "is_train": True, "model": "SelfC_GMM_Codec", "distortion": "sr_bd",
        "scale": 2,
        "datasets": {"train": {"video_len": 3, "GT_size": 32}},
        "network_G": {
            "which_model_G": {"subnet_type": "D2DTNet"},
            "in_nc": 3, "out_nc": 3, "block_num": [1], "scale": 2,
            "init": "xavier", "global_module": "nonlocal", "stp_blk_num": 2,
            "fh_loss": "l2", "h265_q": 16, "lambda_corr": 1e-5,
            "stp_hidden_c": 8, "stp_denseblock_innerc": 4,
        },
        "path": {},
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
class TestMeshEval:
    def test_rescale_gop_batch_sharded_matches_sequential(self):
        """gop_batch groups sharded over a dp=2 mesh == the sequential
        per-GOP loop, exactly (deterministic l2 prior). T=18/gop=7 makes
        3 groups -> two batched calls of 2 (the second group-padded), each
        call's axis 0 split across the two devices."""
        from selfc_tpu.train.rescale_model import RescaleModel

        gt = np.random.default_rng(11).random((1, 18, 32, 32, 3)).astype(
            np.float32
        )
        opt = _rescale_opt()
        opt["val"] = dict_to_nonedict({"gop_batch": 1})
        m = RescaleModel(opt, mesh=_mesh2())
        m.feed_data({"GT": gt})
        m.test(gop=7)
        base = (m.fake_H.copy(), m.forw_L.copy(), m.forw_H.copy())

        m.opt["val"]["gop_batch"] = 2
        m.feed_data({"GT": gt})
        m.test(gop=7)
        for a, b in zip(base, (m.fake_H, m.forw_L, m.forw_H)):
            assert a.shape == b.shape
            np.testing.assert_allclose(a, b, atol=2e-5)

    def test_codec_eval_sharded_matches_serial(self):
        """Streaming codec eval: batched tile/segment calls sharded over a
        dp=2 mesh (encode batch = seg_batch*dw*B = 8, decode batch = 16)
        == the reference-shaped serial loop on the same model."""
        from selfc_tpu.train.codec_model import CodecModel

        clip = np.random.default_rng(12).random((1, 7, 32, 32, 3)).astype(
            np.float32
        )
        opt = _codec_opt()
        opt["val"] = dict_to_nonedict(
            {"batch_tiles": False, "seg_batch": 1, "overlap": False}
        )
        m = CodecModel(opt, mesh=_mesh2())
        m.feed_data({"GT": clip})
        m.test()
        base = (m.fake_H.copy(), np.asarray(m.forw_L).copy(), m.video_bpp)

        m.opt["val"].update(
            {"batch_tiles": True, "seg_batch": 4, "overlap": True}
        )
        m.feed_data({"GT": clip})
        m.test()
        np.testing.assert_allclose(base[0], m.fake_H, atol=2e-5)
        np.testing.assert_allclose(base[1], np.asarray(m.forw_L), atol=2e-5)
        assert base[2] == pytest.approx(m.video_bpp)
