"""SpyNet optical flow + warp refinement (reference spy_flow.py:161-375)
and the motion-consistency loss (reference loss.py:25-62).

Channels-last. The reference loads the 4-level pyramid conv weights from
DVC's ``.npy`` files (spy_flow.py:141-158); ``load_spynet_npy`` imports the
same layout when the files are available — otherwise the net starts from
torch-default init (the shipped SelfC configs never train/use the flow
loss: SelfC_model.py:58 is commented).
"""

from __future__ import annotations

import os

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.conv import torch_default_b, torch_default_w


def _resize_matrix(in_size, out_size, align_corners):
    """Bilinear interpolation matrix (out, in) matching torch
    F.interpolate(mode='bilinear')."""
    m = np.zeros((out_size, in_size), np.float32)
    for i in range(out_size):
        if align_corners and out_size > 1:
            src = i * (in_size - 1) / (out_size - 1)
        else:
            src = (i + 0.5) * in_size / out_size - 0.5
        src = min(max(src, 0.0), in_size - 1)
        lo = int(np.floor(src))
        hi = min(lo + 1, in_size - 1)
        w = src - lo
        m[i, lo] += 1 - w
        m[i, hi] += w
    return m


def resize_bilinear(x, out_hw, align_corners=False):
    """(..., H, W, C) -> (..., oh, ow, C)."""
    *_, H, W, C = x.shape
    mh = jnp.asarray(_resize_matrix(H, out_hw[0], align_corners))
    mw = jnp.asarray(_resize_matrix(W, out_hw[1], align_corners))
    y = jnp.einsum("oh,...hwc->...owc", mh, x)
    return jnp.einsum("pw,...owc->...opc", mw, y)


def flow_warp(img, flow):
    """Warp img (N,H,W,C) by flow (N,H,W,2) (dx, dy in pixels), bilinear
    with border padding — reproduces the reference torch_warp
    (spy_flow.py:69-86) including its align_corners=False pixel mapping."""
    N, H, W, C = img.shape
    gx = jnp.linspace(-1.0, 1.0, W)[None, None, :]
    gy = jnp.linspace(-1.0, 1.0, H)[None, :, None]
    nx = gx + 2.0 * flow[..., 0] / (W - 1.0)
    ny = gy + 2.0 * flow[..., 1] / (H - 1.0)
    # grid_sample align_corners=False: x = ((g+1)*W - 1)/2
    px = ((nx + 1.0) * W - 1.0) * 0.5
    py = ((ny + 1.0) * H - 1.0) * 0.5
    px = jnp.clip(px, 0.0, W - 1.0)  # border padding
    py = jnp.clip(py, 0.0, H - 1.0)
    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    wx = (px - x0)[..., None]
    wy = (py - y0)[..., None]
    flat = img.reshape(N, H * W, C)

    def tap(yy, xx):
        yc = jnp.clip(yy, 0, H - 1).astype(jnp.int32)
        xc = jnp.clip(xx, 0, W - 1).astype(jnp.int32)
        idx = (yc * W + xc).reshape(N, H * W, 1)
        return jnp.take_along_axis(flat, idx, axis=1).reshape(N, H, W, C)

    v00, v01 = tap(y0, x0), tap(y0, x0 + 1)
    v10, v11 = tap(y0 + 1, x0), tap(y0 + 1, x0 + 1)
    return (
        v00 * (1 - wy) * (1 - wx) + v01 * (1 - wy) * wx
        + v10 * wy * (1 - wx) + v11 * wy * wx
    )


class MEBasic(nn.Module):
    """One pyramid level: 5 7x7 convs 8->32->64->32->16->2 (reference
    :161-188)."""

    @nn.compact
    def __call__(self, x):
        for i, c in enumerate([32, 64, 32, 16, 2]):
            x = nn.Conv(
                c, (7, 7), padding="SAME",
                kernel_init=torch_default_w,
                bias_init=torch_default_b(x.shape[-1] * 49),
                name=f"conv{i + 1}",
            )(x)
            if i < 4:
                x = nn.relu(x)
        return x


class MESpynet(nn.Module):
    """4-level coarse-to-fine flow (reference ME_Spynet, :331-375).
    im1, im2: (N,H,W,3) -> flow (N,H,W,2)."""

    levels: int = 4

    @nn.compact
    def __call__(self, im1, im2):
        min_side = 2 ** self.levels
        if im1.shape[1] < min_side or im1.shape[2] < min_side:
            raise ValueError(
                f"MESpynet needs H,W >= {min_side} for {self.levels} pyramid "
                f"levels; got {im1.shape[1:3]}"
            )
        modules = [MEBasic(name=f"modelL{i + 1}") for i in range(self.levels)]
        im1s, im2s = [im1], [im2]
        for _ in range(self.levels - 1):
            im1s.append(nn.avg_pool(im1s[-1], (2, 2), (2, 2)))
            im2s.append(nn.avg_pool(im2s[-1], (2, 2), (2, 2)))
        coarsest = im2s[-1]
        flow = jnp.zeros(
            (im1.shape[0], coarsest.shape[1] // 2, coarsest.shape[2] // 2, 2),
            im1.dtype,
        )
        for level in range(self.levels):
            up = resize_bilinear(
                flow, (flow.shape[1] * 2, flow.shape[2] * 2)
            ) * 2.0
            a = im1s[self.levels - 1 - level]
            b = flow_warp(im2s[self.levels - 1 - level], up)
            flow = up + modules[level](jnp.concatenate([a, b, up], axis=-1))
        return flow


class ResBlock(nn.Module):
    c_out: int
    k: int = 3

    @nn.compact
    def __call__(self, x):
        h = nn.relu(x)
        h = nn.Conv(self.c_out, (self.k, self.k), padding="SAME", name="conv1")(h)
        h = nn.relu(h)
        h = nn.Conv(self.c_out, (self.k, self.k), padding="SAME", name="conv2")(h)
        if x.shape[-1] != self.c_out:
            x = nn.Conv(self.c_out, (1, 1), name="adapt_conv")(x)
        return x + h


class WarpNet(nn.Module):
    """Post-warp refinement U-net (reference Warp_net, :281-315)."""

    @nn.compact
    def __call__(self, x):  # (N,H,W,6)
        cn = 64
        f = nn.relu(nn.Conv(cn, (3, 3), padding="SAME", name="feature_ext")(x))
        c0 = ResBlock(cn, name="conv0")(f)
        c0p = nn.avg_pool(c0, (2, 2), (2, 2))
        c1 = ResBlock(cn, name="conv1")(c0p)
        c1p = nn.avg_pool(c1, (2, 2), (2, 2))
        c2 = ResBlock(cn, name="conv2")(c1p)
        c3 = ResBlock(cn, name="conv3")(c2)
        c3u = c1 + resize_bilinear(c3, (c3.shape[1] * 2, c3.shape[2] * 2), True)
        c4 = ResBlock(cn, name="conv4")(c3u)
        c4u = c0 + resize_bilinear(c4, (c4.shape[1] * 2, c4.shape[2] * 2), True)
        c5 = ResBlock(cn, name="conv5")(c4u)
        return nn.Conv(3, (3, 3), padding="SAME", name="conv6")(c5)


def load_spynet_npy(models_path: str, levels: int = 4,
                    layername: str = "motion_estimation") -> dict:
    """Import DVC flow_pretrain_np .npy weights into MESpynet params
    (reference loadweightformnp, spy_flow.py:141-158)."""
    params: dict = {}
    for lv in range(levels):
        lname = f"{layername}modelL{lv + 1}"
        level_params = {}
        for ci in range(1, 6):
            w = np.load(os.path.join(models_path, f"modelL{lv + 1}_F-{ci}-weight.npy"))
            b = np.load(os.path.join(models_path, f"modelL{lv + 1}_F-{ci}-bias.npy"))
            level_params[f"conv{ci}"] = {
                "kernel": jnp.asarray(w.transpose(2, 3, 1, 0)),
                "bias": jnp.asarray(b),
            }
        params[f"modelL{lv + 1}"] = level_params
    return params


def motion_flow_loss(flow_net_apply, lr_pair, hr_pair, scale: int = 4):
    """MotionFlowLoss (reference loss.py:25-62): LR flow should match the
    area-downsampled HR flow, both normalized by (size-1)/2."""
    hr1, hr2 = hr_pair
    lr1, lr2 = lr_pair
    target_mv = flow_net_apply(hr2, hr1)
    th, tw = target_mv.shape[1] // scale, target_mv.shape[2] // scale
    target_mv = target_mv.reshape(
        target_mv.shape[0], th, scale, tw, scale, 2
    ).mean(axis=(2, 4))
    lr_mv = flow_net_apply(lr2, lr1)

    def norm(mv, h, w):
        return jnp.stack(
            [mv[..., 0] / ((w - 1.0) / 2.0), mv[..., 1] / ((h - 1.0) / 2.0)],
            axis=-1,
        )

    t = norm(target_mv, th, tw)
    l = norm(lr_mv, lr_mv.shape[1], lr_mv.shape[2])
    return jnp.mean((jax.lax.stop_gradient(t) - l) ** 2)
