"""Fused Pallas dense-chain kernel vs the XLA formulation.

Runs in interpreter mode on the CPU mesh (SELFC_TPU_PALLAS=1 forces the
fused path off-TPU). Covers the kernel directly, the custom-VJP gradients,
and the integrated DenseChain fused/unfused equivalence incl. edge-tile
masking (H spanning multiple row tiles).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.tpu  # part of the on-TPU kernel regression lane

from selfc_tpu.models.blocks import D2DT, DenseBlock2D
from selfc_tpu.ops.pallas_chain import (
    _pallas_impl,
    _xla_impl,
    chain_shapes_ok,
    fused_dense_spatial,
)


@pytest.fixture(autouse=True)
def _force_pallas(monkeypatch):
    monkeypatch.setenv("SELFC_TPU_PALLAS", "1")


def _mk_chain(rng, C):
    ws = tuple(
        jnp.asarray(rng.normal(0, 0.1, (3, 3, C + 32 * i, 32)), jnp.float32)
        for i in range(4)
    )
    bs = tuple(
        jnp.asarray(rng.normal(0, 0.1, (32,)), jnp.float32) for _ in range(4)
    )
    return ws, bs


@pytest.mark.parametrize(
    "shape",
    [
        (1, 2, 24, 32, 3),   # multi-tile H -> exercises halo/edge masking
        (1, 2, 24, 32, 48),
        (2, 1, 16, 32, 64),
        (1, 1, 12, 16, 51),  # unaligned C -> zero-row padding path
    ],
)
def test_kernel_matches_xla(shape):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, shape), jnp.float32)
    ws, bs = _mk_chain(rng, shape[-1])
    ref = _xla_impl(x, ws, bs)
    out = _pallas_impl(x, ws, bs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_custom_vjp_matches_xla_grads():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(0, 1, (1, 1, 12, 16, 3)), jnp.float32)
    ws, bs = _mk_chain(rng, 3)

    def loss_f(x, ws, bs):
        return jnp.sum(fused_dense_spatial(x, ws, bs) ** 2)

    def loss_r(x, ws, bs):
        return jnp.sum(_xla_impl(x, ws, bs) ** 2)

    g1 = jax.grad(loss_f, argnums=(0, 1, 2))(x, ws, bs)
    g2 = jax.grad(loss_r, argnums=(0, 1, 2))(x, ws, bs)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=2e-3)


def test_dense_chain_module_fused_equals_unfused():
    rng = np.random.default_rng(2)
    for cls, shape, cin, cout in [
        (D2DT, (1, 2, 24, 32, 3), 3, 48),
        (D2DT, (1, 2, 12, 16, 64), 64, 64),
        (DenseBlock2D, (3, 24, 32, 48), 48, 3),  # 4-D image path
    ]:
        x = jnp.asarray(rng.normal(0, 1, shape), jnp.float32)
        m = cls(cin, cout)
        v = m.init(jax.random.PRNGKey(0), x)
        os.environ["SELFC_TPU_PALLAS"] = "0"
        y0 = m.apply(v, x)
        os.environ["SELFC_TPU_PALLAS"] = "1"
        y1 = m.apply(v, x)
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y0), atol=2e-5)


def test_shape_gate():
    assert chain_shapes_ok(144, 176, 51)
    assert not chain_shapes_ok(145, 176, 51)  # H with no usable tile
    assert not chain_shapes_ok(144, 177, 51)  # W not 16-aligned


# --------------------------------------------------------------------------
# v2: whole-chain kernel (fused temporal conv5 over rotating T slots)
# --------------------------------------------------------------------------

from selfc_tpu.ops.pallas_chain import (  # noqa: E402
    _pallas_impl_v2,
    _xla_impl_v2,
    chain_v2_shapes_ok,
    fused_dense_chain_t,
)


def _mk_chain_v2(rng, C, c_out):
    ws, bs = _mk_chain(rng, C)
    w5 = jnp.asarray(rng.normal(0, 0.1, (3, C + 128, c_out)), jnp.float32)
    b5 = jnp.asarray(rng.normal(0, 0.1, (c_out,)), jnp.float32)
    return ws, bs, w5, b5


@pytest.mark.parametrize(
    "shape,c_out",
    [
        ((1, 7, 24, 32, 3), 48),   # T=7 exercises the full slot rotation
        ((2, 3, 24, 32, 48), 3),   # multi-batch, tiny Cout
        ((1, 1, 12, 16, 64), 64),  # T=1 edge (both neighbors zero)
        ((1, 2, 12, 16, 51), 12),  # unaligned C
        ((2, 3, 36, 36, 3), 48),   # train-config latent: W padded 36->48
        ((1, 2, 24, 20, 48), 9),   # W padded 20->32
        ((1, 2, 8, 8, 3), 48),     # tiny test latent: W padded 8->16
    ],
)
def test_v2_kernel_matches_xla(shape, c_out):
    rng = np.random.default_rng(0)
    C = shape[-1]
    ws, bs, w5, b5 = _mk_chain_v2(rng, C, c_out)
    x = jnp.asarray(rng.normal(0, 1, shape), jnp.float32)
    want = _xla_impl_v2(x, ws, bs, w5, b5)
    got = _pallas_impl_v2(x, ws, bs, w5, b5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_v2_custom_vjp_matches_xla_grads():
    rng = np.random.default_rng(1)
    ws, bs, w5, b5 = _mk_chain_v2(rng, 3, 48)
    x = jnp.asarray(rng.normal(0, 1, (1, 3, 12, 16, 3)), jnp.float32)

    def loss_f(x, ws, bs, w5, b5):
        return jnp.sum(fused_dense_chain_t(x, ws, bs, w5, b5) ** 2)

    def loss_r(x, ws, bs, w5, b5):
        return jnp.sum(_xla_impl_v2(x, ws, bs, w5, b5) ** 2)

    g1 = jax.grad(loss_f, argnums=(0, 1, 2, 3, 4))(x, ws, bs, w5, b5)
    g2 = jax.grad(loss_r, argnums=(0, 1, 2, 3, 4))(x, ws, bs, w5, b5)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=2e-3)


def test_v2_custom_vjp_padded_w_grads():
    # W=36 exercises the pad-to-48 forward; backward recomputes via XLA,
    # so this pins end-to-end grad correctness through the padded path.
    rng = np.random.default_rng(3)
    ws, bs, w5, b5 = _mk_chain_v2(rng, 3, 48)
    x = jnp.asarray(rng.normal(0, 1, (1, 2, 12, 36, 3)), jnp.float32)

    def loss_f(x):
        return jnp.sum(fused_dense_chain_t(x, ws, bs, w5, b5) ** 2)

    def loss_r(x):
        return jnp.sum(_xla_impl_v2(x, ws, bs, w5, b5) ** 2)

    np.testing.assert_allclose(float(loss_f(x)), float(loss_r(x)), rtol=1e-5)
    g1, g2 = jax.grad(loss_f)(x), jax.grad(loss_r)(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-5, atol=2e-3)


def test_w_packing_matches_unpacked(monkeypatch):
    """Batch-packing along W (train-shape latents, W=36 -> 4 stripes of
    144 cols) must be invisible: forward and every gradient equal the
    unpacked kernel and the XLA oracle."""
    from selfc_tpu.ops.pallas_chain import (
        _pick_pack_w,
        fused_dense_chain_t_ep,
    )

    rng = np.random.default_rng(11)
    ws, bs, w5, b5 = _mk_chain_v2(rng, 3, 48)
    B, T, H, W = 4, 2, 12, 36
    assert _pick_pack_w(B, W) == 4
    x = jnp.asarray(rng.normal(0, 0.5, (B, T, H, W, 3)), jnp.float32)
    a = jnp.asarray(rng.normal(0, 0.5, (B, T, H, W, 48)), jnp.float32)
    m = jnp.asarray(rng.random((B, T, H, W, 48)) + 0.5, jnp.float32)

    def loss(fn_chain, x, a, m):
        y = fn_chain(x)
        z = fused_dense_chain_t_ep(x, ws, bs, w5, b5, "mul_add", 1.0, a, m)
        return jnp.sum(y ** 2) + jnp.sum(z ** 2)

    def run():
        f = lambda x: fused_dense_chain_t(x, ws, bs, w5, b5)  # noqa: E731
        y = f(x)
        g = jax.grad(loss, argnums=(1, 2, 3))(f, x, a, m)
        return y, g

    monkeypatch.setenv("SELFC_TPU_PALLAS_PACK_W", "1")
    y_p, g_p = run()
    monkeypatch.setenv("SELFC_TPU_PALLAS_PACK_W", "0")
    y_u, g_u = run()
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_u),
                               rtol=1e-5, atol=1e-5)
    for u, v in zip(jax.tree.leaves(g_p), jax.tree.leaves(g_u)):
        np.testing.assert_allclose(np.asarray(u), np.asarray(v),
                                   rtol=1e-5, atol=1e-4)
    # and vs the pure-XLA chain
    y_x = _xla_impl_v2(x, ws, bs, w5, b5)
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_x),
                               rtol=1e-4, atol=2e-4)


def test_ep_in_input_dtype_bf16(monkeypatch):
    """Opt-in bf16 epilogue (SELFC_TPU_PALLAS_EP_IN_DT=1): per-dx partials
    round to bf16 before the combine; must stay within bf16 rounding of
    the XLA bf16 oracle (one extra rounding per dx tap)."""
    from selfc_tpu.ops.pallas_chain import _pallas_impl_v2

    rng = np.random.default_rng(13)
    ws, bs, w5, b5 = _mk_chain_v2(rng, 3, 48)
    x = jnp.asarray(rng.normal(0, 0.5, (1, 2, 12, 32, 3)), jnp.float32)
    bf = jnp.bfloat16
    xb = x.astype(bf)
    wsb = tuple(w.astype(bf) for w in ws)
    w5b = w5.astype(bf)

    monkeypatch.setenv("SELFC_TPU_PALLAS_EP_IN_DT", "1")
    got = _pallas_impl_v2(xb, wsb, bs, w5b, b5)
    monkeypatch.setenv("SELFC_TPU_PALLAS_EP_IN_DT", "0")
    ref = _pallas_impl_v2(xb, wsb, bs, w5b, b5)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        rtol=0.05, atol=0.05,
    )


def test_saved_feats_bwd_matches_recompute_bwd(monkeypatch):
    """The saved-feats adjoint (forward kernel emits the chain features,
    backward loads them) must produce the same gradients as the
    recompute-in-kernel adjoint, on plain and epilogue chains."""
    from selfc_tpu.ops.pallas_chain import fused_dense_chain_t_ep

    rng = np.random.default_rng(9)
    ws, bs, w5, b5 = _mk_chain_v2(rng, 3, 48)
    # W=10 also exercises the padded-width feats hand-off (Wp=16)
    x = jnp.asarray(rng.normal(0, 1, (1, 3, 12, 10, 3)), jnp.float32)
    a = jnp.asarray(rng.normal(0, 1, (1, 3, 12, 10, 48)), jnp.float32)
    m = jnp.asarray(rng.random((1, 3, 12, 10, 48)) + 0.5, jnp.float32)

    def loss(x, ws, bs, w5, b5):
        y = fused_dense_chain_t(x, ws, bs, w5, b5)
        z = fused_dense_chain_t_ep(x, ws, bs, w5, b5, "mul_add", 1.0, a, m)
        return jnp.sum(y ** 2) + jnp.sum(z ** 2)

    def grads():
        return jax.grad(loss, argnums=(0, 1, 2, 3, 4))(x, ws, bs, w5, b5)

    monkeypatch.setenv("SELFC_TPU_PALLAS_SAVE_FEATS", "1")
    g_saved = grads()
    monkeypatch.setenv("SELFC_TPU_PALLAS_SAVE_FEATS", "0")
    g_rec = grads()
    for u, v in zip(jax.tree.leaves(g_saved), jax.tree.leaves(g_rec)):
        np.testing.assert_allclose(np.asarray(u), np.asarray(v),
                                   rtol=1e-5, atol=1e-4)


def test_v2_shape_gate():
    assert chain_v2_shapes_ok(7, 144, 176, 51, 48)
    assert not chain_v2_shapes_ok(7, 145, 176, 51, 48)  # no usable tile
    assert chain_v2_shapes_ok(7, 144, 177, 51, 48)   # W pads 177->192
    assert chain_v2_shapes_ok(7, 36, 36, 51, 48)     # train latent 36->48
    assert not chain_v2_shapes_ok(7, 36, 7, 51, 48)  # pad ratio > 2: XLA


# --------------------------------------------------------------------------
# v3: dy-packed low-K contractions
# --------------------------------------------------------------------------

from selfc_tpu.ops.pallas_chain import (  # noqa: E402
    _pallas_impl_v3,
    _pick_pack_depth,
    chain_v3_shapes_ok,
)


def test_v3_pack_depth():
    assert _pick_pack_depth(32) == 2   # conv1 3->1 passes, conv2 3->2
    assert _pick_pack_depth(64) == 4   # conv4 K=160: 6->4 passes


@pytest.mark.parametrize(
    "shape,c_out",
    [
        ((1, 7, 24, 32, 3), 48),   # X=32, P=2; full slot rotation
        ((2, 3, 24, 32, 48), 3),   # X=64, P=4; multi-batch, tiny Cout
        ((1, 1, 12, 16, 64), 64),  # T=1 edge
        ((1, 2, 12, 16, 51), 12),  # unaligned C
        ((1, 2, 48, 32, 3), 48),   # multi-tile H -> triplet halo/edge rows
    ],
)
def test_v3_kernel_matches_xla(shape, c_out):
    rng = np.random.default_rng(0)
    C = shape[-1]
    ws, bs, w5, b5 = _mk_chain_v2(rng, C, c_out)
    x = jnp.asarray(rng.normal(0, 1, shape), jnp.float32)
    want = _xla_impl_v2(x, ws, bs, w5, b5)
    got = _pallas_impl_v3(x, ws, bs, w5, b5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_v3_shape_gate():
    assert chain_v3_shapes_ok(7, 144, 176, 51, 48)
    assert not chain_v3_shapes_ok(7, 145, 176, 51, 48)


# --------------------------------------------------------------------------
# ride variant: conv5 on the spatial dots' spare N lanes (c_out <= 10)
# --------------------------------------------------------------------------

from selfc_tpu.ops.pallas_chain import _pallas_impl_v2r, ride_ok  # noqa: E402


def test_ride_gate(monkeypatch):
    # default OFF (negative perf result on-chip); opt-in via env flag
    assert not ride_ok(3)
    monkeypatch.setenv("SELFC_TPU_PALLAS_RIDE", "1")
    assert ride_ok(3) and ride_ok(10)
    assert not ride_ok(12)  # 96 + 3*12 > 128 lanes


@pytest.mark.parametrize(
    "shape,c_out",
    [
        ((1, 7, 24, 32, 48), 3),   # the F chain shape family
        ((2, 3, 24, 32, 3), 6),
        ((1, 1, 12, 16, 64), 10),  # T=1 edge
        ((1, 2, 48, 32, 51), 3),   # multi-tile H, unaligned C
    ],
)
def test_ride_kernel_matches_xla(shape, c_out):
    rng = np.random.default_rng(7)
    C = shape[-1]
    ws, bs, w5, b5 = _mk_chain_v2(rng, C, c_out)
    x = jnp.asarray(rng.normal(0, 1, shape), jnp.float32)
    want = _xla_impl_v2(x, ws, bs, w5, b5)
    got = _pallas_impl_v2r(x, ws, bs, w5, b5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_ride_with_epilogue_matches_oracle():
    from selfc_tpu.ops.pallas_chain import ep_apply as _ep

    rng = np.random.default_rng(8)
    shape, c_out = (1, 4, 24, 32, 48), 3
    ws, bs, w5, b5 = _mk_chain_v2(rng, shape[-1], c_out)
    x = jnp.asarray(rng.normal(0, 1, shape), jnp.float32)
    a = jnp.asarray(rng.normal(0, 1, shape[:-1] + (c_out,)), jnp.float32)
    want = _ep(_xla_impl_v2(x, ws, bs, w5, b5), "add", 1.0, a)
    got = _pallas_impl_v2r(x, ws, bs, w5, b5, ep="add", a=a)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


# --------------------------------------------------------------------------
# fused coupling epilogues
# --------------------------------------------------------------------------

from selfc_tpu.ops.pallas_chain import (  # noqa: E402
    EP_AUX,
    ep_apply,
    fused_dense_chain_t_ep,
)


@pytest.mark.parametrize(
    "mode", ["add", "sub_from", "sig_exp", "sig_exp_neg", "mul_add", "sub_mul"]
)
def test_ep_kernel_matches_oracle(mode):
    rng = np.random.default_rng(3)
    shape, c_out = (1, 3, 24, 32, 3), 48
    ws, bs, w5, b5 = _mk_chain_v2(rng, shape[-1], c_out)
    x = jnp.asarray(rng.normal(0, 1, shape), jnp.float32)
    out_shape = shape[:-1] + (c_out,)
    a = jnp.asarray(rng.normal(0, 1, out_shape), jnp.float32)
    m = jnp.asarray(rng.normal(0, 1, out_shape), jnp.float32)
    n_aux = EP_AUX[mode]
    aa = a if n_aux >= 1 else None
    mm = m if n_aux >= 2 else None
    want = ep_apply(_xla_impl_v2(x, ws, bs, w5, b5), mode, 1.0, aa, mm)
    got = fused_dense_chain_t_ep(x, ws, bs, w5, b5, mode, 1.0, aa, mm)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_ep_grads_match_oracle():
    rng = np.random.default_rng(4)
    ws, bs, w5, b5 = _mk_chain_v2(rng, 3, 48)
    x = jnp.asarray(rng.normal(0, 1, (1, 3, 12, 16, 3)), jnp.float32)
    a = jnp.asarray(rng.normal(0, 1, (1, 3, 12, 16, 48)), jnp.float32)
    m = jnp.asarray(rng.normal(0, 1, (1, 3, 12, 16, 48)), jnp.float32)

    def loss_f(x, ws, bs, w5, b5, a, m):
        return jnp.sum(
            fused_dense_chain_t_ep(x, ws, bs, w5, b5, "mul_add", 1.0, a, m)
            ** 2
        )

    def loss_r(x, ws, bs, w5, b5, a, m):
        return jnp.sum(
            ep_apply(_xla_impl_v2(x, ws, bs, w5, b5), "mul_add", 1.0, a, m)
            ** 2
        )

    g1 = jax.grad(loss_f, argnums=(0, 1, 2, 3, 4, 5, 6))(
        x, ws, bs, w5, b5, a, m
    )
    g2 = jax.grad(loss_r, argnums=(0, 1, 2, 3, 4, 5, 6))(
        x, ws, bs, w5, b5, a, m
    )
    for u, v in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(u), np.asarray(v), rtol=1e-5, atol=2e-3)


def test_coupling_fused_matches_plain():
    """InvBlockExp with the fused epilogue path (kernel, forced interpret)
    vs SELFC_TPU_PALLAS=0 (pure XLA): forward, reverse, invertibility."""
    from selfc_tpu.models.blocks import subnet
    from selfc_tpu.models.coupling import InvBlockExp

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(0, 0.5, (1, 3, 24, 32, 51)), jnp.float32)
    blk = InvBlockExp(51, 3, subnet("D2DTNet", "xavier"))
    v = blk.init(jax.random.PRNGKey(0), x)

    outs = {}
    for flag in ("0", "1"):
        os.environ["SELFC_TPU_PALLAS"] = flag
        y, jac = blk.apply(v, x, False)
        xr, jac_r = blk.apply(v, y, True)
        outs[flag] = (np.asarray(y), float(jac), np.asarray(xr), float(jac_r))
    os.environ["SELFC_TPU_PALLAS"] = "1"
    np.testing.assert_allclose(outs["1"][0], outs["0"][0], atol=3e-5)
    np.testing.assert_allclose(outs["1"][2], outs["0"][2], atol=3e-5)
    assert abs(outs["1"][1] - outs["0"][1]) < 1e-2 * max(1, abs(outs["0"][1]))
    # exact invertibility through the fused path
    np.testing.assert_allclose(outs["1"][2], np.asarray(x), atol=1e-4)


# --------------------------------------------------------------------------
# HG pair kernel (both coupling subnets + the y2 combine in one launch)
# --------------------------------------------------------------------------

from selfc_tpu.ops.pallas_chain import (  # noqa: E402
    _xla_hg,
    fused_hg_pair,
    hg_shapes_ok,
)


@pytest.mark.parametrize("rev", [False, True])
@pytest.mark.parametrize(
    "shape,c_out",
    [
        ((1, 3, 24, 32, 3), 48),  # flagship-like, multi-tile H
        ((2, 2, 12, 20, 3), 12),  # codec-like c_out, W padded 20->32
    ],
)
def test_hg_kernel_matches_oracle(shape, c_out, rev):
    rng = np.random.default_rng(11)
    h = _mk_chain_v2(rng, shape[-1], c_out)
    g = _mk_chain_v2(rng, shape[-1], c_out)
    x = jnp.asarray(rng.normal(0, 1, shape), jnp.float32)
    x2 = jnp.asarray(rng.normal(0, 1, shape[:-1] + (c_out,)), jnp.float32)
    y2a, sea = fused_hg_pair(x, x2, *h, *g, 1.0, rev)
    y2b, seb = _xla_hg(x, x2, *h, *g, 1.0, rev)
    np.testing.assert_allclose(np.asarray(y2a), np.asarray(y2b), atol=2e-4)
    np.testing.assert_allclose(np.asarray(sea), np.asarray(seb), atol=2e-5)


def test_hg_grads_match_oracle():
    rng = np.random.default_rng(12)
    h = _mk_chain_v2(rng, 3, 12)
    g = _mk_chain_v2(rng, 3, 12)
    x = jnp.asarray(rng.normal(0, 1, (1, 2, 8, 16, 3)), jnp.float32)
    x2 = jnp.asarray(rng.normal(0, 1, (1, 2, 8, 16, 12)), jnp.float32)

    def loss(fn):
        def go(x, x2, h, g):
            y2, se = fn(x, x2, *h, *g, 1.0, False)
            # jac-style log(se) term pins gradient flow through se too
            return jnp.sum(y2 ** 2) + jnp.sum(jnp.log(se))
        return go

    np.testing.assert_allclose(
        float(loss(fused_hg_pair)(x, x2, h, g)),
        float(loss(_xla_hg)(x, x2, h, g)), rtol=1e-5,
    )
    ga = jax.grad(loss(fused_hg_pair), argnums=(0, 1, 2, 3))(x, x2, h, g)
    gb = jax.grad(loss(_xla_hg), argnums=(0, 1, 2, 3))(x, x2, h, g)
    for u, v in zip(jax.tree.leaves(ga), jax.tree.leaves(gb)):
        np.testing.assert_allclose(np.asarray(u), np.asarray(v), rtol=1e-5, atol=2e-3)


def test_hg_shape_gate():
    assert hg_shapes_ok(7, 144, 176, 3, 48)
    assert hg_shapes_ok(7, 36, 36, 3, 48)       # train latent, W pads 36->48
    assert not hg_shapes_ok(7, 145, 176, 3, 48)  # no usable tile
    assert not hg_shapes_ok(7, 36, 7, 3, 48)     # pad ratio > 2


def test_coupling_hg_off_matches_on():
    """InvBlockExp: the HG pair path (default when kernels are on) vs the
    two-launch ep path (SELFC_TPU_PALLAS_HG=0) — identical fwd/rev/jac."""
    from selfc_tpu.models.blocks import subnet
    from selfc_tpu.models.coupling import InvBlockExp

    rng = np.random.default_rng(13)
    x = jnp.asarray(rng.normal(0, 0.5, (1, 2, 12, 16, 51)), jnp.float32)
    blk = InvBlockExp(51, 3, subnet("D2DTNet", "xavier"))
    v = blk.init(jax.random.PRNGKey(0), x)

    outs = {}
    for flag in ("0", "1"):
        os.environ["SELFC_TPU_PALLAS_HG"] = flag
        y, jac = blk.apply(v, x, False)
        xr, jac_r = blk.apply(v, y, True)
        outs[flag] = (np.asarray(y), float(jac), np.asarray(xr), float(jac_r))
    del os.environ["SELFC_TPU_PALLAS_HG"]
    np.testing.assert_allclose(outs["1"][0], outs["0"][0], atol=3e-5)
    np.testing.assert_allclose(outs["1"][2], outs["0"][2], atol=3e-5)
    assert abs(outs["1"][1] - outs["0"][1]) < 1e-2 * max(1, abs(outs["0"][1]))
    np.testing.assert_allclose(outs["1"][2], np.asarray(x), atol=1e-4)


# --------------------------------------------------------------------------
# gc < 32 chains (codec STP gc=12) via zero-padded growth segments
# --------------------------------------------------------------------------

from selfc_tpu.ops.pallas_chain import fused_dense_chain_t  # noqa: E402


def _mk_chain_gc(rng, C, gc, c_out):
    ws = tuple(
        jnp.asarray(rng.normal(0, 0.1, (3, 3, C + gc * i, gc)), jnp.float32)
        for i in range(4)
    )
    bs = tuple(
        jnp.asarray(rng.normal(0, 0.1, (gc,)), jnp.float32) for _ in range(4)
    )
    w5 = jnp.asarray(rng.normal(0, 0.1, (3, C + 4 * gc, c_out)), jnp.float32)
    b5 = jnp.asarray(rng.normal(0, 0.1, (c_out,)), jnp.float32)
    return ws, bs, w5, b5


@pytest.mark.parametrize("gc,c_in,c_out", [(12, 3, 12), (12, 12, 3), (24, 24, 24)])
def test_small_gc_chain_matches_xla(gc, c_in, c_out):
    from selfc_tpu.ops.pallas_chain import _xla_impl_v2

    rng = np.random.default_rng(21)
    ws, bs, w5, b5 = _mk_chain_gc(rng, c_in, gc, c_out)
    x = jnp.asarray(rng.normal(0, 1, (1, 3, 12, 16, c_in)), jnp.float32)
    # oracle at TRUE gc (generic convs handle any gc)
    want = _xla_impl_v2(x, ws, bs, w5, b5)
    got = fused_dense_chain_t(x, ws, bs, w5, b5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_small_gc_grads_match_xla():
    from selfc_tpu.ops.pallas_chain import _xla_impl_v2

    rng = np.random.default_rng(22)
    ws, bs, w5, b5 = _mk_chain_gc(rng, 3, 12, 12)
    x = jnp.asarray(rng.normal(0, 1, (1, 2, 8, 16, 3)), jnp.float32)

    def loss_f(x, ws, bs, w5, b5):
        return jnp.sum(fused_dense_chain_t(x, ws, bs, w5, b5) ** 2)

    def loss_r(x, ws, bs, w5, b5):
        return jnp.sum(_xla_impl_v2(x, ws, bs, w5, b5) ** 2)

    g1 = jax.grad(loss_f, argnums=(0, 1, 2, 3, 4))(x, ws, bs, w5, b5)
    g2 = jax.grad(loss_r, argnums=(0, 1, 2, 3, 4))(x, ws, bs, w5, b5)
    for u, v in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        # grads must come back at TRUE gc shapes (pad slice adjoint)
        assert u.shape == v.shape
        np.testing.assert_allclose(np.asarray(u), np.asarray(v), rtol=1e-5, atol=2e-3)


def test_codec_stp_chain_module_fused_equals_unfused():
    """The codec-STP D2DT block (gc=12, hidden 24) through the module API:
    kernel on vs off."""
    rng = np.random.default_rng(23)
    x = jnp.asarray(rng.normal(0, 0.5, (1, 3, 12, 16, 24)), jnp.float32)
    blk = D2DT(24, 24, 12, "plain_xavier")
    v = blk.init(jax.random.PRNGKey(0), x)
    os.environ["SELFC_TPU_PALLAS"] = "0"
    want = blk.apply(v, x)
    os.environ["SELFC_TPU_PALLAS"] = "1"
    got = blk.apply(v, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-5)


# --- fused backward (_pallas_bwd) -------------------------------------------


def _mk_chain_v2(rng, C, c_out):  # re-exported for clarity in this section
    from tests.test_pallas_chain import _mk_chain  # noqa: F401
    ws, bs = _mk_chain(rng, C)
    w5 = jnp.asarray(rng.normal(0, 0.1, (3, C + 128, c_out)), jnp.float32)
    b5 = jnp.asarray(rng.normal(0, 0.1, (c_out,)), jnp.float32)
    return ws, bs, w5, b5


def test_pallas_bwd_multi_tile_overlap_add(monkeypatch):
    """Force 2 row tiles so dx assembles from overlapping halo windows."""
    from selfc_tpu.ops.pallas_chain import _pallas_bwd, _xla_impl

    monkeypatch.setenv("SELFC_TPU_TILE_H_BWD", "12")
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(0, 1, (2, 24, 36, 3)), jnp.float32)  # W%16!=0
    ws, bs = _mk_chain(rng, 3)
    g = jnp.asarray(rng.normal(0, 1, (2, 24, 36, 128)), jnp.float32)

    dx, dws, dbs = _pallas_bwd(x, ws, bs, g)
    _, vjp = jax.vjp(_xla_impl, x, ws, bs)
    rdx, rdws, rdbs = vjp(g)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(rdx),
                               rtol=1e-5, atol=1e-4)
    for a, b in zip(jax.tree.leaves((dws, dbs)),
                    jax.tree.leaves((rdws, rdbs))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-3)


def test_pallas_bwd_bf16():
    """bf16 activations: the fused adjoint must be no less accurate vs the
    fp32 ground truth than the XLA bf16 vjp it replaces. (On-chip it is
    4-16x MORE accurate: dwork accumulates in f32 while the XLA chain
    adjoint rounds through bf16 at every conv hop.)"""
    from selfc_tpu.ops.pallas_chain import _pallas_bwd, _xla_impl

    rng = np.random.default_rng(6)
    xf = jnp.asarray(rng.normal(0, 1, (1, 12, 16, 32)), jnp.float32)
    ws, bs = _mk_chain(rng, 32)
    gf = jnp.asarray(rng.normal(0, 1, (1, 12, 16, 128)), jnp.float32)
    _, vjp = jax.vjp(_xla_impl, xf, ws, bs)
    truth = vjp(gf)

    bf = jnp.bfloat16
    xb, gb = xf.astype(bf), gf.astype(bf)
    wsb = tuple(w.astype(bf) for w in ws)
    bsb = tuple(b.astype(bf) for b in bs)
    got = _pallas_bwd(xb, wsb, bsb, gb)
    _, vjpb = jax.vjp(_xla_impl, xb, wsb, bsb)
    ref = vjpb(gb)
    for a, b, t in zip(jax.tree.leaves(got), jax.tree.leaves(ref),
                       jax.tree.leaves(truth)):
        ea = np.abs(np.asarray(a, np.float32) - np.asarray(t)).max()
        eb = np.abs(np.asarray(b, np.float32) - np.asarray(t)).max()
        assert ea <= 2.0 * eb + 1e-3, (ea, eb)


def test_pallas_feats_matches_xla():
    from selfc_tpu.ops.pallas_chain import _pallas_feats, _xla_impl

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(0, 1, (1, 2, 12, 36, 3)), jnp.float32)
    ws, bs = _mk_chain(rng, 3)
    np.testing.assert_allclose(
        np.asarray(_pallas_feats(x, ws, bs)),
        np.asarray(_xla_impl(x, ws, bs)),
        atol=2e-5,
    )
