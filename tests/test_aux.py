"""Aux component coverage: SpyNet construction + npy weight import,
WarpNet, motion-flow loss, log comparator, heatmap util."""

import os
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class TestSpyNet:
    def test_flow_net_runs_and_shapes(self):
        from selfc_tpu.models.spy_flow import MESpynet

        net = MESpynet()
        a = jnp.asarray(np.random.default_rng(0).random((1, 32, 32, 3)), jnp.float32)
        b = jnp.asarray(np.random.default_rng(1).random((1, 32, 32, 3)), jnp.float32)
        v = net.init(jax.random.PRNGKey(0), a, b)
        flow = net.apply(v, a, b)
        assert flow.shape == (1, 32, 32, 2)
        assert np.isfinite(np.asarray(flow)).all()

    def test_npy_weight_import(self, tmp_path):
        from selfc_tpu.models.spy_flow import MESpynet, load_spynet_npy

        rng = np.random.default_rng(2)
        chans = [(8, 32), (32, 64), (64, 32), (32, 16), (16, 2)]
        for lv in range(4):
            for ci, (cin, cout) in enumerate(chans, start=1):
                np.save(tmp_path / f"modelL{lv+1}_F-{ci}-weight.npy",
                        rng.standard_normal((cout, cin, 7, 7)).astype(np.float32))
                np.save(tmp_path / f"modelL{lv+1}_F-{ci}-bias.npy",
                        rng.standard_normal(cout).astype(np.float32))
        params = load_spynet_npy(str(tmp_path))
        net = MESpynet()
        a = jnp.zeros((1, 16, 16, 3))
        template = net.init(jax.random.PRNGKey(0), a, a)["params"]
        assert (
            jax.tree_util.tree_structure(template)
            == jax.tree_util.tree_structure(params)
        )
        flow = net.apply({"params": params}, a, a)
        assert flow.shape == (1, 16, 16, 2)

    def test_warp_net(self):
        from selfc_tpu.models.spy_flow import WarpNet

        net = WarpNet()
        x = jnp.asarray(np.random.default_rng(3).random((1, 16, 16, 6)), jnp.float32)
        v = net.init(jax.random.PRNGKey(0), x)
        y = net.apply(v, x)
        assert y.shape == (1, 16, 16, 3)

    def test_motion_flow_loss(self):
        from selfc_tpu.models.spy_flow import MESpynet, motion_flow_loss

        net = MESpynet()
        hr = jnp.asarray(np.random.default_rng(4).random((1, 64, 64, 3)), jnp.float32)
        lr = jnp.asarray(np.random.default_rng(5).random((1, 16, 16, 3)), jnp.float32)
        v = net.init(jax.random.PRNGKey(0), hr, hr)

        def apply(a, b):
            return net.apply(v, a, b)

        loss = motion_flow_loss(apply, (lr, lr), (hr, hr), scale=4)
        assert np.isfinite(float(loss))


class TestCompareLogsCLI:
    def test_golden_self_compare(self, tmp_path):
        golden = "/root/reference/test_logs/VUG_compression_bf/test_selfc_h265bf_q9.log"
        if not os.path.exists(golden):
            pytest.skip("golden logs unavailable")
        r = subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "compare_logs.py"),
             golden, golden],
            capture_output=True, text=True,
        )
        assert r.returncode == 0, r.stdout[-500:]
        assert "0 outside tolerance" in r.stdout

    def test_detects_drift(self, tmp_path):
        a = tmp_path / "a.log"
        b = tmp_path / "b.log"
        a.write_text(" HR results for city, PSNR 28.500000dB, SSIM 0.870000\n")
        b.write_text(" HR results for city, PSNR 27.100000dB, SSIM 0.870000\n")
        r = subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "compare_logs.py"),
             str(a), str(b)],
            capture_output=True, text=True,
        )
        assert r.returncode == 1
        assert "FAIL" in r.stdout


def test_tensor2heatmap():
    from selfc_tpu.utils.logger import tensor2heatmap

    h = tensor2heatmap(np.random.default_rng(6).random((8, 8)))
    assert h.shape == (8, 8, 3) and h.dtype == np.uint8
