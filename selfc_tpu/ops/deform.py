"""Modulated deformable 3x3 convolution (deform_conv2d) for TPU.

torchvision.ops.deform_conv2d (CUDA) has no XLA primitive — the reference
leans on it for its `deform` / `grouped_global_deform` aggregation modules
(SelfC_GMM_arch_inv.py:173-180,241-248). Here it is decomposed into
bilinear gathers + 9 pointwise matmuls, which XLA maps to dynamic-gather +
MXU ops. Offset channel layout follows torchvision: for kernel position
k = i*3+j, channels (2k, 2k+1) are the (dy, dx) offsets.
"""

from __future__ import annotations

import jax.numpy as jnp


def _bilinear_gather(img, py, px):
    """Sample img (B,H,W,C) at float coords (py, px) each (B,H,W); zeros
    outside the image (torchvision convention)."""
    B, H, W, C = img.shape
    y0 = jnp.floor(py)
    x0 = jnp.floor(px)
    wy = (py - y0)[..., None]
    wx = (px - x0)[..., None]
    flat = img.reshape(B, H * W, C)

    def tap(yy, xx):
        valid = (yy >= 0) & (yy < H) & (xx >= 0) & (xx < W)
        yc = jnp.clip(yy, 0, H - 1).astype(jnp.int32)
        xc = jnp.clip(xx, 0, W - 1).astype(jnp.int32)
        idx = (yc * W + xc).reshape(B, H * W, 1)
        v = jnp.take_along_axis(flat, idx, axis=1).reshape(B, H, W, C)
        return v * valid[..., None]

    v00 = tap(y0, x0)
    v01 = tap(y0, x0 + 1)
    v10 = tap(y0 + 1, x0)
    v11 = tap(y0 + 1, x0 + 1)
    return (
        v00 * (1 - wy) * (1 - wx)
        + v01 * (1 - wy) * wx
        + v10 * wy * (1 - wx)
        + v11 * wy * wx
    )


def deform_conv2d(x, offset, mask, weight, bias=None):
    """x: (B,H,W,C); offset: (B,H,W,2*KK); mask: (B,H,W,KK);
    weight: (3,3,C,Cout). stride 1, padding 1 (SAME)."""
    B, H, W, C = x.shape
    K = weight.shape[0]
    gy = jnp.arange(H, dtype=x.dtype)[None, :, None]
    gx = jnp.arange(W, dtype=x.dtype)[None, None, :]
    out = 0.0
    for i in range(K):
        for j in range(K):
            k = i * K + j
            dy = offset[..., 2 * k]
            dx = offset[..., 2 * k + 1]
            py = gy + (i - K // 2) + dy
            px = gx + (j - K // 2) + dx
            sampled = _bilinear_gather(x, py, px) * mask[..., k][..., None]
            out = out + jnp.einsum("bhwc,cd->bhwd", sampled, weight[i, j])
    if bias is not None:
        out = out + bias
    return out
