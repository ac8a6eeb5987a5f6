"""Pallas kernel correctness (runs interpreted on the CPU test mesh)."""

import numpy as np

import jax
import jax.numpy as jnp

from selfc_tpu.ops.conv import leaky_relu, temporal_conv3
from selfc_tpu.ops.pallas_kernels import temporal_conv3_pallas


def test_temporal_conv3_pallas_matches_xla():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((2, 5, 8, 16, 20)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 20, 12)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal(12) * 0.1, jnp.float32)
    want = temporal_conv3(x, w, b)
    got = temporal_conv3_pallas(x, w, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_temporal_conv3_pallas_fused_lrelu():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.random((1, 3, 8, 8, 7)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 7, 5)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal(5) * 0.1, jnp.float32)
    want = leaky_relu(temporal_conv3(x, w, b), 0.2)
    got = temporal_conv3_pallas(x, w, b, negative_slope=0.2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_temporal_conv3_pallas_grads_match_xla():
    # regression: the kernel is differentiable via custom VJP (pallas_call
    # has no autodiff rule — the fp32-master bf16-activation train path
    # hits this op whenever the chain kernels don't fuse conv5 in)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.random((1, 3, 8, 16, 20)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 20, 12)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal(12) * 0.1, jnp.float32)

    def loss_p(x, w, b):
        return jnp.sum(temporal_conv3_pallas(x, w, b, negative_slope=0.2) ** 2)

    def loss_x(x, w, b):
        return jnp.sum(leaky_relu(temporal_conv3(x, w, b), 0.2) ** 2)

    gp = jax.grad(loss_p, argnums=(0, 1, 2))(x, w, b)
    gx = jax.grad(loss_x, argnums=(0, 1, 2))(x, w, b)
    for a_, b_ in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a_), np.asarray(b_),
                                   rtol=1e-4, atol=1e-4)


def test_ragged_shape_falls_back():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.random((1, 3, 5, 7, 4)), jnp.float32)  # S=35 odd
    w = jnp.asarray(rng.standard_normal((3, 4, 4)) * 0.1, jnp.float32)
    want = temporal_conv3(x, w, None)
    got = temporal_conv3_pallas(x, w, None, tile_s=16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
