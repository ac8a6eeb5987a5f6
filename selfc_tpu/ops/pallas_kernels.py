"""Pallas TPU kernels for the hot ops.

``temporal_conv3_pallas`` — the (3,1,1) temporal convolution that closes
every D2DT dense chain (reference Subnet_constructor.py:106). The kernel
streams spatial row-tiles through VMEM and accumulates the three shifted
taps as MXU dots in one pass, fusing bias and (optionally) the LeakyReLU
of the surrounding chain instead of materializing intermediate tensors.

The three taps are expressed as three BlockSpec views into the same
T-padded activation buffer (block index == element offset along T because
the T block size is 1), which keeps the windows overlapping without any
data duplication.

Enabled via ``SELFC_TPU_PALLAS=1``; falls back to the XLA path off-TPU or
for unsupported shapes.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def pallas_enabled() -> bool:
    return os.environ.get("SELFC_TPU_PALLAS") == "1"


def _kernel(x0_ref, x1_ref, x2_ref, w_ref, b_ref, o_ref, *, negative_slope):
    # x*_ref: (ts, C) taps t-1, t, t+1; w_ref: (3, C, Co); b_ref: (1, Co)
    # explicit precision: sub-f32 operands must not inherit a global
    # 'highest' matmul policy (see pallas_chain._mxu_precision)
    prec = (None if x0_ref.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    acc = jnp.dot(x0_ref[:], w_ref[0], preferred_element_type=jnp.float32,
                  precision=prec)
    acc += jnp.dot(x1_ref[:], w_ref[1], preferred_element_type=jnp.float32,
                   precision=prec)
    acc += jnp.dot(x2_ref[:], w_ref[2], preferred_element_type=jnp.float32,
                   precision=prec)
    acc = acc + b_ref[0]
    if negative_slope is not None:
        acc = jnp.where(acc >= 0, acc, negative_slope * acc)
    o_ref[:] = acc.astype(o_ref.dtype)


def temporal_conv3_pallas(x, w, b=None, negative_slope=None, tile_s: int = 1024):
    """x: (B,T,H,W,C); w: (3,C,Co); b: (Co,). Zero-padded along T.

    Equivalent to ops.conv.temporal_conv3 (+ optional fused LeakyReLU).
    Differentiable: backward re-derives through the XLA formulation via a
    custom VJP (pallas_call itself has no autodiff rule)."""
    if b is None:
        b = jnp.zeros((w.shape[-1],), x.dtype)
    ns = -1.0 if negative_slope is None else float(negative_slope)
    return _tc3_cv(x, w.astype(x.dtype), b.astype(x.dtype), ns, int(tile_s))


def _tc3_xla(x, w, b, ns):
    from .conv import leaky_relu, temporal_conv3

    y = temporal_conv3(x, w, b)
    return leaky_relu(y, ns) if ns >= 0 else y


@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _tc3_cv(x, w, b, ns, tile_s):
    return _tc3_impl(x, w, b, negative_slope=None if ns < 0 else ns,
                     tile_s=tile_s)


def _tc3_fwd(x, w, b, ns, tile_s):
    return _tc3_cv(x, w, b, ns, tile_s), (x, w, b)


def _tc3_bwd(ns, tile_s, res, g):
    x, w, b = res
    _, vjp = jax.vjp(lambda x, w, b: _tc3_xla(x, w, b, ns), x, w, b)
    return vjp(g)


_tc3_cv.defvjp(_tc3_fwd, _tc3_bwd)


def _tc3_impl(x, w, b=None, negative_slope=None, tile_s: int = 1024):
    B, T, H, W, C = x.shape
    Co = w.shape[-1]
    S = H * W
    ts = min(tile_s, S)
    while S % ts != 0 and ts > 8:
        ts //= 2
    if S % ts != 0:
        from .conv import leaky_relu, temporal_conv3

        y = temporal_conv3(x, w, b)
        return leaky_relu(y, negative_slope) if negative_slope is not None else y

    xp = jnp.pad(x.reshape(B, T, S, C), ((0, 0), (1, 1), (0, 0), (0, 0)))
    bb = jnp.zeros((1, Co), x.dtype) if b is None else b.reshape(1, Co).astype(x.dtype)

    def tap(k):
        return pl.BlockSpec(
            (None, None, ts, C), lambda bi, t, si, k=k: (bi, t + k, si, 0)
        )

    out = pl.pallas_call(
        partial(_kernel, negative_slope=negative_slope),
        out_shape=jax.ShapeDtypeStruct((B, T, S, Co), x.dtype),
        grid=(B, T, S // ts),
        interpret=jax.default_backend() == "cpu",
        in_specs=[
            tap(0),
            tap(1),
            tap(2),
            pl.BlockSpec((3, C, Co), lambda bi, t, si: (0, 0, 0)),
            pl.BlockSpec((1, Co), lambda bi, t, si: (0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (None, None, ts, Co), lambda bi, t, si: (bi, t, si, 0)
        ),
    )(xp, xp, xp, w.astype(x.dtype), bb)
    return out.reshape(B, T, H, W, Co)
