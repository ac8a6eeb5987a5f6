"""Numerical parity vs the reference implementation executed in torch-CPU.

These tests load the reference modules from /root/reference (read-only),
initialize them with torch's RNG, import the resulting state_dict into our
flax models via utils/torch_import, and compare outputs element-wise.
This is the strongest possible check that a reference ``.pth`` checkpoint
would reproduce identical numerics on TPU.
"""

import os
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

REF = "/root/reference/codes"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference repo not mounted"
)


def _install_ref_stubs():
    """Stub the reference's unavailable native deps (torchvision, skvideo).

    Delegates to the shared conftest installer so every test file sees the
    SAME (complete) torchvision stub regardless of import order.
    """
    from conftest import install_reference_stubs

    install_reference_stubs()


@pytest.fixture(scope="module")
def ref():
    _install_ref_stubs()
    import global_var

    global_var.GlobalVar.set_Temporal_LEN(3)
    global_var.GlobalVar.set_Istrain(True)
    from models.modules import SelfC_GMM_arch_inv as gmm_arch
    from models.modules import Subnet_constructor as subnet_mod

    return types.SimpleNamespace(
        gmm_arch=gmm_arch, subnet_mod=subnet_mod, global_var=global_var
    )


def to_ours(x_torch_flat, B, T):
    """(B*T, C, H, W) torch -> (B, T, H, W, C) jax."""
    a = x_torch_flat.detach().numpy()
    BT, C, H, W = a.shape
    return jnp.asarray(a.reshape(B, T, C, H, W).transpose(0, 1, 3, 4, 2))


def to_torch_flat(x):
    """(B,T,H,W,C) -> torch (B*T, C, H, W)."""
    a = np.asarray(x)
    B, T, H, W, C = a.shape
    return torch.from_numpy(a.transpose(0, 1, 4, 2, 3).reshape(B * T, C, H, W))


class TestD2DTParity:
    def test_d2dt_block_matches_reference(self, ref):
        from selfc_tpu.models.blocks import D2DT
        from selfc_tpu.utils.torch_import import convert_tensor

        torch.manual_seed(0)
        blk = ref.subnet_mod.D2DTInput(3, 64, INN_init=False)
        x = torch.randn(6, 3, 16, 16)  # B=2, T=3 flattened
        with torch.no_grad():
            want = blk(x)

        params = {"chain": {}}
        for name, t in blk.state_dict().items():
            conv, leaf = name.split(".")
            params["chain"].setdefault(conv, {})[leaf] = jnp.asarray(
                convert_tensor(name, t.numpy())
            )
        ours = D2DT(3, 64, init_mode="plain_xavier")
        got = ours.apply({"params": params}, to_ours(x, 2, 3))
        np.testing.assert_allclose(
            np.asarray(to_torch_flat(got)), want.numpy(), rtol=1e-4, atol=1e-5
        )


class TestSelfCGMMParity:
    @pytest.fixture(scope="class")
    def pair(self, ref):
        from selfc_tpu.models.inv_nets import SelfCNetGMM
        from selfc_tpu.utils.torch_import import import_state_dict

        opt = {
            "global_module": "nonlocal",
            "stp_blk_num": 6,
            "fh_loss": "gmm",
            "scale": 4,
            "gmm_k": 5,
        }
        torch.manual_seed(7)
        tnet = ref.gmm_arch.SelfCInvNet(opt, 3, 3, "D2DTNet", [4, 4], 2)
        tnet.eval()
        params = import_state_dict(tnet.state_dict(), "gmm", (4, 4))
        jnet = SelfCNetGMM()
        return types.SimpleNamespace(tnet=tnet, jnet=jnet, params=params)

    def test_param_tree_structure_matches_init(self, pair):
        jnet = pair.jnet
        x = jnp.zeros((1, 3, 32, 32, 3))
        ref_vars = jnet.init(
            {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
            x,
            method=jnet.roundtrip,
        )["params"]
        want = jax.tree_util.tree_structure(ref_vars)
        got = jax.tree_util.tree_structure(
            jax.tree.map(jnp.asarray, pair.params)
        )
        assert want == got, "imported param tree differs from init structure"

    def test_encode_matches_reference_forward(self, pair, ref):
        B, T, H, W = 1, 3, 32, 32
        torch.manual_seed(1)
        x = torch.rand(B * T, 3, H, W)
        with torch.no_grad():
            want, _ = pair.tnet(x, rev=False)
        got, _ = pair.jnet.apply(
            {"params": pair.params}, to_ours(x, B, T), method=pair.jnet.encode
        )
        np.testing.assert_allclose(
            np.asarray(to_torch_flat(got)), want.numpy(), rtol=1e-3, atol=1e-4
        )

    def test_decode_matches_reference_reverse(self, pair, ref):
        B, T, h, w = 1, 3, 8, 8
        torch.manual_seed(2)
        lr = torch.rand(B * T, 3, h, w)
        hf = 0.01 * torch.randn(B, 48, T, h, w)

        # bypass the stochastic prior: force the same HF sample on both sides
        orig_sample = pair.tnet.stp_net.sample
        pair.tnet.stp_net.sample = lambda: hf
        try:
            with torch.no_grad():
                want, _ = pair.tnet(lr, rev=True)
        finally:
            pair.tnet.stp_net.sample = orig_sample

        hf_ours = jnp.asarray(hf.numpy().transpose(0, 2, 3, 4, 1))  # (B,T,h,w,48)
        got, _ = pair.jnet.apply(
            {"params": pair.params},
            to_ours(lr, B, T),
            hf_ours,
            method=pair.jnet.decode_with_hf,
        )
        np.testing.assert_allclose(
            np.asarray(to_torch_flat(got)), want.numpy(), rtol=1e-3, atol=1e-4
        )

    def test_stp_prior_params_match_reference(self, pair, ref):
        B, T, h, w = 1, 3, 8, 8
        torch.manual_seed(3)
        lr = torch.rand(B, 3, T, h, w)  # reference STP input (b,c,t,h,w)
        with torch.no_grad():
            pair.tnet.stp_net(lr)
            want = pair.tnet.stp_net.parameters  # (b, hf*K*3, t, h, w)
        got = pair.jnet.apply(
            {"params": pair.params},
            jnp.asarray(lr.numpy().transpose(0, 2, 3, 4, 1)),
            method=pair.jnet.prior_params,
        )
        got_nchw = np.asarray(got).transpose(0, 4, 1, 2, 3)  # (b, C, t, h, w)
        np.testing.assert_allclose(
            got_nchw, want.numpy(), rtol=1e-3, atol=1e-4
        )

    def test_invertibility_roundtrip(self, pair):
        """encode -> decode_with_hf(true hf) must reproduce the input up to
        the FrequencyAnalyzer's fixed shuffle permutation — verify the
        coupling chain alone is exactly invertible."""
        B, T, H, W = 1, 3, 32, 32
        x = jnp.asarray(np.random.default_rng(5).random((B, T, H, W, 3)), jnp.float32)
        y, _ = pair.jnet.apply(
            {"params": pair.params}, x, method=pair.jnet.encode
        )
        lr, hf = y[..., :3], y[..., 3:]
        _, latent = pair.jnet.apply(
            {"params": pair.params}, lr, hf, method=pair.jnet.decode_with_hf
        )
        # latent is the pre-FrequencyAnalyzer coupling input reconstructed
        from selfc_tpu.ops.freq import freq_forward

        np.testing.assert_allclose(
            np.asarray(latent), np.asarray(freq_forward(x, 4)),
            rtol=1e-4, atol=1e-5,
        )
