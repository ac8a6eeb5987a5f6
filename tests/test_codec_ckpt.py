"""Codec checkpoint roundtrips and the codec INN op-chain parity."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.test_codec import _tiny_codec_opt

REF = "/root/reference/codes"


@pytest.mark.slow
def test_codec_save_then_eval_load(tmp_path):
    """Train-mode model (with surrogate) saves; eval-mode model (no
    surrogate) loads the same file — the surrogate subtree is dropped,
    like the reference's load_network key skip."""
    from selfc_tpu.train.codec_model import CodecModel

    opt = _tiny_codec_opt(tmp_path, str(tmp_path))
    m = CodecModel(opt)
    path = m.save("roundtrip")
    assert path.endswith("roundtrip_G.msgpack")

    eval_opt = _tiny_codec_opt(tmp_path, str(tmp_path))
    eval_opt["is_train"] = False
    eval_opt["train"] = None
    eval_opt["path"]["pretrain_model_G"] = path
    m2 = CodecModel(eval_opt)
    a = jax.device_get(m.params["net"])
    b = jax.device_get(m2.params["net"])
    flat_a = jax.tree_util.tree_leaves(a)
    flat_b = jax.tree_util.tree_leaves(b)
    for x, y in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.mark.skipif(not os.path.isdir(REF), reason="no reference")
def test_codec_op_chain_parity():
    """The codec INN op chain (FrequencyAnalyzer k=2 + 4 coupling blocks)
    matches the reference with imported weights — run the reference ops
    directly (its full forward_train needs CUDA)."""
    torch = pytest.importorskip("torch")
    from conftest import install_reference_stubs

    install_reference_stubs()
    import global_var

    global_var.GlobalVar.set_Temporal_LEN(3)
    global_var.GlobalVar.set_Istrain(True)
    from models.modules.SelfC_Codec_arch_inv import SelfCInvNet as RefCodec

    from selfc_tpu.models.inv_nets import SelfCNetCodec
    from selfc_tpu.utils.torch_import import import_state_dict

    opt = {"global_module": "nonlocal", "stp_blk_num": 4, "fh_loss": "l2",
           "scale": 2, "gmm_k": 5, "stp_hidden_c": 24,
           "stp_denseblock_innerc": 12, "deart_net": False,
           "h265_q": 16, "h265_keyint": 12, "h265_all_default": False}
    all_opt = {"network_G": opt, "scale": 2, "train": None,
               "datasets": {"train": {"video_len": 3}}}
    torch.manual_seed(9)
    tnet = RefCodec(opt, 3, 3, "D2DTNet", [4], 1, all_opt=all_opt).eval()
    params = import_state_dict(tnet.state_dict(), "codec", (4,))
    jnet = SelfCNetCodec()

    xt = torch.rand(3, 3, 16, 16)
    with torch.no_grad():
        out = xt
        for op in tnet.operations:
            out = op.forward(out, False)
    want = out.numpy()  # (3, 15, 8, 8)

    xo = jnp.asarray(xt.numpy().reshape(1, 3, 3, 16, 16).transpose(0, 1, 3, 4, 2))
    got, _ = jnet.apply({"params": params}, xo, method=jnet.encode)
    got_flat = np.asarray(got).transpose(0, 1, 4, 2, 3).reshape(3, 15, 8, 8)
    np.testing.assert_allclose(got_flat, want, rtol=1e-3, atol=1e-4)
