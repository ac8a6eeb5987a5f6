"""Adversarial training branch (train.gan_weight): wires the reference's
GAN components (GANLoss loss.py:69-101, Discriminator_VGG_128 / VGG
feature extractor discriminator_vgg_arch.py:6-88, define_D/define_F
networks.py:90-113) into the rescale train step.

Covers: loss logging, the BasicSR G-update gating (D_update_ratio /
D_init_iters), D learning, ragan and wgan-gp variants, perceptual loss,
and checkpoint round-trip of the D side.
"""

import numpy as np
import pytest

import jax

from selfc_tpu.config import dict_to_nonedict


def _opt(tmp_path=None, **train_over):
    train = {
        "lr_G": 1e-4, "lr_D": 1e-4, "beta1": 0.9, "beta2": 0.999,
        "lr_scheme": "MultiStepLR", "lr_steps": [], "lr_gamma": 0.5,
        "pixel_criterion_forw": "l2", "pixel_criterion_back": "l1",
        "lambda_fit_forw": 1, "lambda_rec_back": 1,
        "gradient_clipping": 10,
        "gan_type": "gan", "gan_weight": 5e-3,
        "D_update_ratio": 1, "D_init_iters": 0,
    }
    train.update(train_over)
    path = {}
    if tmp_path is not None:
        path = {"models": str(tmp_path / "models"),
                "training_state": str(tmp_path / "state")}
    return dict_to_nonedict({
        "is_train": True, "model": "SelfC_GMM", "distortion": "sr_bd",
        "scale": 4, "datasets": {"train": {"video_len": 3, "GT_size": 32}},
        "network_G": {"which_model_G": {"subnet_type": "D2DTNet"},
                      "block_num": [1, 1], "scale": 4, "init": "xavier",
                      "global_module": "nonlocal", "stp_blk_num": 2,
                      "fh_loss": "gmm", "gmm_k": 2},
        "network_D": {"which_model_D": "discriminator_vgg_128",
                      "in_nc": 3, "nf": 8},
        "path": path,
        "train": train,
    })


def _leaf_norm(tree):
    return float(
        sum(float(jax.numpy.sum(jax.numpy.abs(x)))
            for x in jax.tree.leaves(tree))
    )


def _clip(b=1, t=3, hw=32, seed=0):
    return np.random.default_rng(seed).random((b, t, hw, hw, 3)).astype(
        np.float32
    )


def _model(opt):
    from selfc_tpu.train.rescale_model import RescaleModel

    return RescaleModel(opt)


class TestGANBranch:
    def test_step_logs_and_updates(self):
        model = _model(_opt())
        assert model.gan is not None
        g0 = _leaf_norm(model.params)
        d0 = _leaf_norm(model.gan.d_params)
        model.feed_data({"GT": _clip()})
        model.optimize_parameters(1)
        logs = model.get_current_log()
        for key in ("l_g_gan", "l_d", "D_real", "D_fake", "l_back_rec"):
            assert key in logs and np.isfinite(logs[key]), key
        assert _leaf_norm(model.params) != g0  # G updated (step 1, ratio 1)
        assert _leaf_norm(model.gan.d_params) != d0  # D updated

    def test_g_update_gating(self):
        # D_update_ratio=2, D_init_iters=2: G must not move on steps 1-2
        # (warm-up) nor on odd steps; D moves every step.
        model = _model(_opt(D_update_ratio=2, D_init_iters=2))
        model.feed_data({"GT": _clip()})
        g0 = _leaf_norm(model.params)
        d0 = _leaf_norm(model.gan.d_params)
        model.optimize_parameters(1)  # 1 % 2 != 0 -> G frozen
        assert _leaf_norm(model.params) == pytest.approx(g0)
        assert _leaf_norm(model.gan.d_params) != d0
        model.optimize_parameters(2)  # 2 > D_init_iters is False -> frozen
        assert _leaf_norm(model.params) == pytest.approx(g0)
        model.optimize_parameters(4)  # past warm-up, even -> G updates
        assert _leaf_norm(model.params) != g0

    @pytest.mark.parametrize("gan_type", ["ragan", "lsgan", "wgan-gp"])
    def test_variants(self, gan_type):
        model = _model(_opt(gan_type=gan_type))
        model.feed_data({"GT": _clip()})
        model.optimize_parameters(1)
        logs = model.get_current_log()
        assert np.isfinite(logs["l_d"]) and np.isfinite(logs["l_g_gan"])

    def test_feature_loss(self):
        model = _model(_opt(feature_weight=1.0, feature_criterion="l1"))
        assert model.gan.netF is not None
        model.feed_data({"GT": _clip()})
        model.optimize_parameters(1)
        logs = model.get_current_log()
        assert "l_g_fea" in logs and np.isfinite(logs["l_g_fea"])
        assert logs["l_g_fea"] > 0

    def test_checkpoint_roundtrip(self, tmp_path):
        model = _model(_opt(tmp_path))
        model.feed_data({"GT": _clip()})
        model.optimize_parameters(1)
        model.save(7)
        state_path = model.save_training_state(0, 7)
        d_ref = jax.device_get(model.gan.d_params)

        opt2 = _opt(tmp_path)
        opt2["path"]["pretrain_model_D"] = str(
            tmp_path / "models" / "7_D.msgpack"
        )
        model2 = _model(opt2)
        model2.resume_training(state_path)
        d_new = jax.device_get(model2.gan.d_params)
        for a, b in zip(jax.tree.leaves(d_ref), jax.tree.leaves(d_new)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # D optimizer state restored (non-trivial after one Adam step)
        assert _leaf_norm(model2.gan.d_opt_state) == pytest.approx(
            _leaf_norm(model.gan.d_opt_state)
        )

    def test_plain_model_unaffected(self):
        opt = _opt()
        opt["train"]["gan_weight"] = None
        model = _model(opt)
        assert model.gan is None
        model.feed_data({"GT": _clip()})
        model.optimize_parameters(1)
        assert np.isfinite(model.get_current_log()["loss"])
