"""Modulated deformable 3x3 convolution (deform_conv2d) for TPU.

torchvision.ops.deform_conv2d (CUDA) has no XLA primitive — the reference
leans on it for its `deform` / `grouped_global_deform` aggregation modules
(SelfC_GMM_arch_inv.py:173-180,241-248). Here it is decomposed into
bilinear gathers + 9 pointwise matmuls, which XLA maps to dynamic-gather +
MXU ops. Offset channel layout follows torchvision: for kernel position
k = i*3+j, channels (2k, 2k+1) are the (dy, dx) offsets.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


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


# ---------------------------------------------------------------------------
# Exact Pallas gather kernel (SURVEY §2.4's named kernel: the one op with
# no XLA primitive). The XLA composition above lowers the 36 bilinear taps
# to gather loops that run at ~0.3 TF/s on a v5e (~45 ms/call at the STP
# latent shape). This kernel keeps ONE full input frame VMEM-resident
# (144x176x64 bf16 = 3.2 MB) and, per (frame, row-tile) grid step, resolves
# each kernel position's four bilinear taps as an in-VMEM row gather
# (jnp.take_along_axis over the flattened H*W sublane axis — Mosaic's
# dynamic-gather path) followed by ONE accumulated MXU dot per kernel
# position: 9 dots of (TH*W, C) x (C, Cout) per tile.
#
# Gradients: custom_vjp whose backward is the XLA composition's VJP (the
# adjoint of a gather is a scatter-add, which TPU has no fast path for);
# values and offset grads therefore match deform_conv2d exactly by
# construction. Off-TPU (CPU tests) the kernel runs in interpret mode.
# ---------------------------------------------------------------------------


def _deform_tile_kernel(x_ref, off_ref, mask_ref, w_ref, o_ref, *,
                        TH, H, W, C, K):
    tile = pl.program_id(1)
    f32 = jnp.float32
    img = x_ref[0]                      # (H, W, C) whole frame in VMEM
    flat = img.reshape(H * W, C)        # gather source, sublane axis H*W
    off = off_ref[0].astype(f32)        # (TH, W, 2KK)
    msk = mask_ref[0].astype(f32)       # (TH, W, KK)
    r0 = tile * TH
    gy = (jax.lax.broadcasted_iota(jnp.int32, (TH, W), 0) + r0).astype(f32)
    gx = jax.lax.broadcasted_iota(jnp.int32, (TH, W), 1).astype(f32)
    acc = jnp.zeros((TH * W, w_ref.shape[-1]), f32)
    for i in range(K):
        for j in range(K):
            k = i * K + j
            py = gy + (i - K // 2) + off[..., 2 * k]
            px = gx + (j - K // 2) + off[..., 2 * k + 1]
            y0 = jnp.floor(py)
            x0 = jnp.floor(px)
            wy = py - y0
            wx = px - x0
            val = jnp.zeros((TH * W, C), f32)
            for sy, sx in ((0, 0), (0, 1), (1, 0), (1, 1)):
                yy = y0 + sy
                xx = x0 + sx
                valid = (yy >= 0) & (yy < H) & (xx >= 0) & (xx < W)
                yc = jnp.clip(yy, 0, H - 1).astype(jnp.int32)
                xc = jnp.clip(xx, 0, W - 1).astype(jnp.int32)
                idx = (yc * W + xc).reshape(TH * W, 1)
                g = jnp.take_along_axis(
                    flat, jnp.broadcast_to(idx, (TH * W, C)), axis=0
                ).astype(f32)
                wgt = ((sy * wy + (1 - sy) * (1 - wy))
                       * (sx * wx + (1 - sx) * (1 - wx)))
                wgt = jnp.where(valid, wgt, 0.0)
                val = val + g * wgt.reshape(TH * W, 1)
            val = val * msk[..., k].reshape(TH * W, 1)
            # explicit precision: don't inherit a global 'highest' policy
            # onto sub-f32 operands (Mosaic rejects contract_precision<fp32>
            # on bf16 — see pallas_chain._mxu_precision)
            acc = acc + jax.lax.dot_general(
                val.astype(img.dtype), w_ref[k],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=f32,
                precision=(None if img.dtype == f32
                           else jax.lax.Precision.DEFAULT),
            )
    o_ref[0] = acc.reshape(TH, W, -1).astype(o_ref.dtype)


def _pick_tile_h_deform(H: int, W: int, C: int, c_out: int) -> int | None:
    forced = os.environ.get("SELFC_TPU_TILE_H_DEFORM", "")
    order = (int(forced),) if forced else (32, 24, 16, 12, 8, 6, 4)
    for th in order:
        if H % th != 0:
            continue
        need = (
            H * W * C * 2              # resident frame (bf16)
            + th * W * (3 * 9) * 4     # offsets + mask tiles
            + 3 * th * W * C * 4       # gather/val/acc temporaries
            + th * W * c_out * 4       # out tile
        )
        if need < 10 * 2 ** 20:
            return th
    return None


def deform_pallas_ok(x_shape, c_out: int) -> bool:
    B, H, W, C = x_shape
    return (
        W % 8 == 0 and C % 8 == 0 and c_out % 8 == 0
        and _pick_tile_h_deform(H, W, C, c_out) is not None
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def _deform_pallas_impl(x, offset, mask, weight, interpret=False):
    B, H, W, C = x.shape
    K = weight.shape[0]
    KK = K * K
    c_out = weight.shape[-1]
    TH = _pick_tile_h_deform(H, W, C, c_out)
    w_packed = weight.reshape(KK, C, c_out).astype(x.dtype)
    kern = functools.partial(
        _deform_tile_kernel, TH=TH, H=H, W=W, C=C, K=K
    )
    return pl.pallas_call(
        kern,
        grid=(B, H // TH),
        in_specs=[
            pl.BlockSpec((1, H, W, C), lambda b, t: (b, 0, 0, 0)),
            pl.BlockSpec((1, TH, W, 2 * KK), lambda b, t: (b, t, 0, 0)),
            pl.BlockSpec((1, TH, W, KK), lambda b, t: (b, t, 0, 0)),
            pl.BlockSpec((KK, C, c_out), lambda b, t: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, TH, W, c_out), lambda b, t: (b, t, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, W, c_out), x.dtype),
        interpret=interpret,
    )(x, offset, mask, w_packed)


@jax.custom_vjp
def _deform_pallas_cv(x, offset, mask, weight):
    interp = jax.default_backend() != "tpu"
    return _deform_pallas_impl(x, offset, mask, weight, interpret=interp)


def _deform_cv_fwd(x, offset, mask, weight):
    return _deform_pallas_cv(x, offset, mask, weight), (x, offset, mask, weight)


def _deform_cv_bwd(res, g):
    # adjoint of a per-pixel gather is a scatter-add — no TPU fast path;
    # reuse the XLA composition's VJP (numerically the oracle's gradients)
    x, offset, mask, weight = res
    _, vjp = jax.vjp(
        lambda *a: deform_conv2d(*a, bias=None), x, offset, mask, weight
    )
    return vjp(g)


_deform_pallas_cv.defvjp(_deform_cv_fwd, _deform_cv_bwd)


@functools.lru_cache(None)
def _tpu_dynamic_gather_ok() -> bool:
    """One-time capability probe: does this backend's Mosaic lower the
    in-kernel ``take_along_axis`` row gather? Off-TPU the kernel runs in
    interpret mode (always fine). On TPU a tiny probe kernel compiles
    once; a lowering failure flips the deform default back to the XLA
    composition instead of crashing the model's jit."""
    if os.environ.get("SELFC_TPU_DEFORM_PALLAS", "") == "0":
        return False
    if jax.default_backend() != "tpu":
        return True
    try:
        src = jnp.arange(16 * 128, dtype=jnp.float32).reshape(16, 128)
        idx = jnp.zeros((16, 128), jnp.int32)

        def kern(s_ref, i_ref, o_ref):
            o_ref[...] = jnp.take_along_axis(s_ref[...], i_ref[...], axis=0)

        out = pl.pallas_call(
            kern, out_shape=jax.ShapeDtypeStruct((16, 128), jnp.float32)
        )(src, idx)
        return bool(jnp.isfinite(out).all())
    except Exception:  # pragma: no cover - backend-dependent
        return False


def deform_conv2d_pallas(x, offset, mask, weight, bias=None):
    """Exact ``deform_conv2d`` with the bilinear gather + 9 accumulated
    MXU dots fused in one Pallas kernel (VMEM-resident frame). Falls back
    to the XLA composition when the shape doesn't qualify or the backend
    can't lower the in-kernel gather."""
    if not (deform_pallas_ok(x.shape, weight.shape[-1])
            and _tpu_dynamic_gather_ok()):
        return deform_conv2d(x, offset, mask, weight, bias)
    out = _deform_pallas_cv(x, offset, mask, weight)
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
