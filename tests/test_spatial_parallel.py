"""Spatial-parallel (sp) sharding through the model wrappers on the
virtual 8-device mesh: width sharded across chips, XLA inserting the conv
halo exchanges."""

import numpy as np
import pytest

import jax

from selfc_tpu.config import dict_to_nonedict
from selfc_tpu.parallel.mesh import make_mesh


def _opt():
    return dict_to_nonedict({
        "is_train": True, "model": "SelfC_GMM", "distortion": "sr_bd",
        "scale": 4, "mesh_sp": 2,
        "datasets": {"train": {"video_len": 3, "GT_size": 32}},
        "network_G": {"which_model_G": {"subnet_type": "D2DTNet"},
                       "block_num": [1, 1], "scale": 4, "init": "xavier",
                       "global_module": "nonlocal", "stp_blk_num": 2,
                       "fh_loss": "gmm", "gmm_k": 2},
        "path": {},
        "train": {"lr_G": 1e-4, "beta1": 0.9, "beta2": 0.999,
                   "lr_scheme": "MultiStepLR", "lr_steps": [],
                   "lr_gamma": 0.5, "pixel_criterion_forw": "l2",
                   "pixel_criterion_back": "l1", "lambda_fit_forw": 1,
                   "lambda_rec_back": 1, "gradient_clipping": 10},
    })


@pytest.mark.slow
def test_dp_sp_train_and_eval():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from selfc_tpu.train.rescale_model import RescaleModel

    mesh = make_mesh(dp=4, sp=2)
    model = RescaleModel(_opt(), mesh=mesh)
    assert model._spatial_axis == 3

    rng = np.random.default_rng(0)
    # batch 4 over dp, width 64 over sp (divisible by sp*scale*4)
    clip = rng.random((4, 3, 32, 64, 3)).astype(np.float32)
    model.feed_data({"GT": clip})
    sharding = model.real_H.sharding
    assert "dp" in str(sharding.spec) and "sp" in str(sharding.spec)

    model.optimize_parameters(1)
    logs = model.get_current_log()
    assert np.isfinite(logs["loss"])

    model.test()
    assert model.fake_H.shape == (4, 3, 32, 64, 3)
    assert np.isfinite(model.fake_H).all()
