"""Persistent W-packing across the coupling chain (round-5 perf).

models/inv_nets._chain_pair packs the batch along W ONCE for the whole
8-block chain (stripe-masked kernels keep images independent) instead of
per chain call. These tests pin exact equivalence of outputs, log-jac,
and parameter/input gradients between the packed and unpacked paths at a
shape where the pack actually triggers (B=4, latent 16x16 -> P=4).
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from selfc_tpu.models.inv_nets import SelfCNetGMM
from selfc_tpu.ops.pallas_chain import _pick_pack_w


B, T, HW = 4, 3, 64  # latent 16x16 at scale 4


@pytest.fixture(scope="module")
def net_and_vars():
    net = SelfCNetGMM(scale=4, stp_blk_num=2, fh_loss="l2")
    x = jnp.asarray(
        np.random.default_rng(0).random((B, T, HW, HW, 3)), jnp.float32
    )
    v = net.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        x, method=net.roundtrip,
    )
    return net, v, x


def _run(net, v, x, packed: bool):
    old = os.environ.get("SELFC_TPU_PALLAS_PACK_W")
    os.environ["SELFC_TPU_PALLAS_PACK_W"] = "1" if packed else "0"
    try:
        def loss_fn(params, x):
            y, jac = net.apply({"params": params}, x, method=net.encode)
            return jnp.mean(y ** 2) + 1e-3 * jac, (y, jac)

        (loss, (y, jac)), grads = jax.value_and_grad(
            loss_fn, has_aux=True, argnums=(0, 1)
        )(v["params"], x)
        return loss, y, jac, grads
    finally:
        if old is None:
            os.environ.pop("SELFC_TPU_PALLAS_PACK_W", None)
        else:
            os.environ["SELFC_TPU_PALLAS_PACK_W"] = old


def test_pack_triggers_at_this_shape():
    assert _pick_pack_w(B, HW // 4) == 4


def test_packed_encode_matches_unpacked(net_and_vars):
    net, v, x = net_and_vars
    l0, y0, j0, g0 = _run(net, v, x, packed=False)
    l1, y1, j1, g1 = _run(net, v, x, packed=True)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(float(j1), float(j0), rtol=2e-5, atol=1e-4)
    np.testing.assert_allclose(float(l1), float(l0), rtol=2e-5, atol=2e-5)
    # parameter + input grads
    flat0 = jax.tree_util.tree_leaves(g0)
    flat1 = jax.tree_util.tree_leaves(g1)
    assert len(flat0) == len(flat1)
    for a, b in zip(flat0, flat1):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=3e-4, atol=3e-5)


def test_packed_decode_matches_unpacked(net_and_vars):
    net, v, x = net_and_vars
    y, _ = net.apply({"params": v["params"]}, x, method=net.encode)
    lr, hf = y[..., :3], y[..., 3:]

    def dec(packed):
        old = os.environ.get("SELFC_TPU_PALLAS_PACK_W")
        os.environ["SELFC_TPU_PALLAS_PACK_W"] = "1" if packed else "0"
        try:
            hr, lat = net.apply(
                {"params": v["params"]}, lr, hf, method=net.decode_with_hf
            )
            return np.asarray(hr)
        finally:
            if old is None:
                os.environ.pop("SELFC_TPU_PALLAS_PACK_W", None)
            else:
                os.environ["SELFC_TPU_PALLAS_PACK_W"] = old

    np.testing.assert_allclose(dec(True), dec(False), rtol=2e-5, atol=2e-5)
