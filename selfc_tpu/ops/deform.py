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


def _hat(t):
    """Bilinear interpolation kernel: max(0, 1 - |t|)."""
    return jnp.maximum(0.0, 1.0 - jnp.abs(t))


def deform_conv2d_windowed(x, offset, mask, weight, bias=None, radius=3):
    """Gather-free ``deform_conv2d`` for TPU (bounded displacement).

    The per-element gather (4 bilinear taps x 9 kernel positions) lowers
    to XLA gather loops that run at ~0.3 TF/s on a v5e — ~45 ms per call
    at the STP latent shape. This formulation instead clamps each tap's
    TOTAL displacement (kernel offset + learned offset) to
    ``[-radius, radius]`` and expands the bilinear sample as a dense sum
    over the (2R+1)^2 integer shifts inside the window with hat-function
    weights:

        sampled_k(p) = sum_{|s|<=R} hat(dy_k - s_y) hat(dx_k - s_x)
                                     * x(p + s)

    Every shift is a static slice of one zero-padded copy of ``x``, so
    the whole thing is VPU multiply-adds that XLA fuses — no gathers.
    The 9 per-tap maps then contract against the conv weight in ONE MXU
    dot (contraction length 9*C).

    Exactly equal to ``deform_conv2d`` whenever all displacements satisfy
    |i-1+dy| <= radius and |j-1+dx| <= radius (pinned by test); larger
    learned offsets saturate at the window edge instead of following the
    sample arbitrarily far. Gradients (including through the offsets via
    the hat weights) match the bilinear gather's inside the window.
    """
    B, H, W, C = x.shape
    K = weight.shape[0]
    KK = K * K
    R = int(radius)
    S = 2 * R + 1
    # one padded copy; every window shift is a static slice of it
    xp = jnp.pad(x, ((0, 0), (R, R), (R, R), (0, 0)))
    # clamped total displacement per tap, (B,H,W,KK) each
    dys = []
    dxs = []
    for i in range(K):
        for j in range(K):
            k = i * K + j
            dys.append(jnp.clip(offset[..., 2 * k] + (i - K // 2), -R, R))
            dxs.append(jnp.clip(offset[..., 2 * k + 1] + (j - K // 2), -R, R))
    dy = jnp.stack(dys, axis=-1)  # (B,H,W,KK)
    dx = jnp.stack(dxs, axis=-1)
    acc = [jnp.zeros((B, H, W, C), x.dtype) for _ in range(KK)]
    for sy in range(-R, R + 1):
        wy = _hat(dy - sy)  # (B,H,W,KK)
        for sx in range(-R, R + 1):
            w = wy * _hat(dx - sx) * mask  # (B,H,W,KK)
            xs = xp[:, R + sy:R + sy + H, R + sx:R + sx + W, :]
            w = w.astype(x.dtype)
            for k in range(KK):
                acc[k] = acc[k] + w[..., k:k + 1] * xs
    stacked = jnp.stack(acc, axis=-2)  # (B,H,W,KK,C)
    out = jnp.einsum(
        "bhwkc,kcd->bhwd", stacked, weight.reshape(KK, C, -1),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    if bias is not None:
        out = out + bias
    return out
