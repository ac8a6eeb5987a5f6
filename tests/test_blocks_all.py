"""Construction + shape checks for every subnet family the reference's
subnet() factory can produce (Subnet_constructor.py:719-788), plus codec
STPNet prior parity vs the reference on torch-CPU."""

import os
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from selfc_tpu.models import blocks as B

REF = "/root/reference/codes"


@pytest.mark.parametrize("net_structure", [
    "DBNet", "DB3DNet", "DB3DNet_P", "D2DTNet", "D2DNet",
    "D2DLTInput", "D2DTEnhanceInput", "FeatureCalapseBlock_Fast",
])
def test_subnet_factory_builds_and_runs(net_structure):
    ctor = B.subnet(net_structure, "xavier")
    mod = ctor(4, 6, gc=8, name=None)
    x = jnp.asarray(np.random.default_rng(0).random((1, 3, 8, 8, 4)), jnp.float32)
    v = mod.init(jax.random.PRNGKey(0), x)
    y = mod.apply(v, x)
    assert y.shape == (1, 3, 8, 8, 6)
    assert np.isfinite(np.asarray(y)).all()


@pytest.mark.parametrize("net_structure,spatial", [
    ("FeatureCalapseBlock", 16),        # needs H,W divisible by 4
    ("FeatureCalapseBlock_SmallC", 16),
    ("HighOrderTNet", 16),              # 3-level U-net needs /8
])
def test_subnet_factory_spatial_blocks(net_structure, spatial):
    ctor = B.subnet(net_structure, "xavier")
    mod = ctor(4, 4, name=None)
    x = jnp.asarray(
        np.random.default_rng(0).random((1, 3, spatial, spatial, 4)), jnp.float32
    )
    v = mod.init(jax.random.PRNGKey(0), x)
    y = mod.apply(v, x)
    assert y.shape == x.shape
    assert np.isfinite(np.asarray(y)).all()


def test_res_d2dt_residual_needs_matching_channels():
    ctor = B.subnet("ResD2DTInput", "xavier")
    mod = ctor(4, 4, gc=8, name=None)  # residual => cin == cout
    x = jnp.asarray(np.random.default_rng(0).random((1, 3, 8, 8, 4)), jnp.float32)
    v = mod.init(jax.random.PRNGKey(0), x)
    y = mod.apply(v, x)
    assert y.shape == x.shape


def test_unknown_subnet_raises():
    with pytest.raises(KeyError):
        B.subnet("NoSuchNet")


@pytest.mark.skipif(not os.path.isdir(REF), reason="no reference")
def test_codec_stp_prior_parity():
    """Codec-flavored STPNet (hidden 24 / gc 12, l2 tail) matches the
    reference SelfC_Codec_arch_inv.STPNet on shared weights."""
    torch = pytest.importorskip("torch")
    from conftest import install_reference_stubs

    install_reference_stubs()
    import global_var

    global_var.GlobalVar.set_Temporal_LEN(3)
    from models.modules.SelfC_Codec_arch_inv import STPNet as RefSTP

    from selfc_tpu.models.stp import STPNet
    from selfc_tpu.utils.torch_import import import_state_dict

    opt = {"global_module": "nonlocal", "stp_blk_num": 4, "fh_loss": "l2",
           "scale": 2, "gmm_k": 5, "stp_hidden_c": 24,
           "stp_denseblock_innerc": 12}
    torch.manual_seed(3)
    tnet = RefSTP(opt).eval()
    tree = import_state_dict(
        {"stp_net." + k: v for k, v in tnet.state_dict().items()}, "codec"
    )
    jnet = STPNet(scale=2, stp_blk_num=4, fh_loss="l2", hidden_c=24, gc=12)

    lr = torch.rand(1, 3, 3, 8, 8)  # (b,c,t,h,w)
    with torch.no_grad():
        tnet(lr)
        want = tnet.parameters  # (b, hf, t, h, w)
    got = jnet.apply(
        {"params": tree["stp_net"]},
        jnp.asarray(lr.numpy().transpose(0, 2, 3, 4, 1)),
    )
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 4, 1, 2, 3), want.numpy(),
        rtol=1e-3, atol=1e-4,
    )
