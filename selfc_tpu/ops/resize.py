"""Resampling ops, channels-last ``(..., H, W, C)``.

Covers the reference's resampling surface:
  * integer-factor 'area' down/up (torch ``nn.Upsample(mode='area')``,
    SelfC_GMM_arch_inv.py:66-69),
  * torch-exact ``adaptive_avg_pool2d`` (GlobalAgg, SelfC_GMM_arch_inv.py:270),
  * DUF-style Gaussian (BD) downsampling (models/Guassian.py:7-52),
  * MATLAB-compatible bicubic resize (models/modules/matlab_lr.py).

All window indices are computed at trace time from static shapes, so every
op lowers to static gathers/matmuls — no dynamic shapes under jit.
"""

from __future__ import annotations

import math
from functools import lru_cache

import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Area (integer factor)
# ---------------------------------------------------------------------------


def area_down(x, k: int):
    """k x k average pooling == torch Upsample(scale_factor=1/k, mode='area')."""
    *lead, H, W, C = x.shape
    x = x.reshape(*lead, H // k, k, W // k, k, C)
    return x.mean(axis=(-4, -2))


def area_up(x, k: int):
    """Integer 'area' upsample == nearest duplication of each pixel."""
    x = jnp.repeat(x, k, axis=-3)
    return jnp.repeat(x, k, axis=-2)


# ---------------------------------------------------------------------------
# Adaptive average pooling (torch-exact windows)
# ---------------------------------------------------------------------------


def _adaptive_matrix(in_size: int, out_size: int) -> np.ndarray:
    """(out, in) averaging matrix with torch adaptive_avg_pool window rule:
    start = floor(i*in/out), end = ceil((i+1)*in/out)."""
    m = np.zeros((out_size, in_size), np.float32)
    for i in range(out_size):
        s = (i * in_size) // out_size
        e = -((-(i + 1) * in_size) // out_size)  # ceil
        m[i, s:e] = 1.0 / (e - s)
    return m


def adaptive_avg_pool2d(x, out_hw):
    """x: (..., H, W, C) -> (..., out_h, out_w, C), torch-exact."""
    *_, H, W, C = x.shape
    oh, ow = out_hw
    mh = jnp.asarray(_adaptive_matrix(H, oh), x.dtype)
    mw = jnp.asarray(_adaptive_matrix(W, ow), x.dtype)
    y = jnp.einsum("oh,...hwc->...owc", mh, x)
    return jnp.einsum("pw,...owc->...opc", mw, y)


# ---------------------------------------------------------------------------
# Gaussian (BD) downsample — the `distortion: sr_bd` LR target
# ---------------------------------------------------------------------------


@lru_cache(maxsize=None)
def _gauss_kernel_1d(sigma: float, taps: int = 13) -> tuple:
    """scipy.ndimage.gaussian_filter-compatible truncated gaussian
    (truncate=4.0): zero outside radius int(4*sigma+0.5)."""
    radius = min(int(4.0 * sigma + 0.5), taps // 2)
    half = taps // 2
    w = np.zeros(taps, np.float64)
    for i in range(-radius, radius + 1):
        w[half + i] = math.exp(-0.5 * (i / sigma) ** 2)
    w /= w.sum()
    return tuple(w.tolist())


def gaussian_downsample(x, scale: int = 4):
    """DUF-style BD degradation (reference models/Guassian.py:7-52).

    x: (..., H, W, C). Blur with a 13x13 gaussian (sigma=0.4*scale), reflect
    pad (6 + 2*scale), stride-`scale` sample, then crop 2 px per side —
    numerically identical to the reference pipeline.
    """
    if scale not in (2, 3, 4):
        raise ValueError(f"BD scale {scale} unsupported")
    w1d = np.asarray(_gauss_kernel_1d(0.4 * scale), np.float32)
    pad = 6 + scale * 2
    *lead, H, W, C = x.shape
    xf = x.reshape(-1, H, W, C)
    xp = jnp.pad(xf, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")
    # separable blur + stride via gathered matmuls (static indices)
    Ho = (xp.shape[1] - 13) // scale + 1
    Wo = (xp.shape[2] - 13) // scale + 1
    mh = np.zeros((Ho, xp.shape[1]), np.float32)
    for i in range(Ho):
        mh[i, i * scale : i * scale + 13] = w1d
    mw = np.zeros((Wo, xp.shape[2]), np.float32)
    for i in range(Wo):
        mw[i, i * scale : i * scale + 13] = w1d
    y = jnp.einsum("oh,nhwc->nowc", jnp.asarray(mh, x.dtype), xp)
    y = jnp.einsum("pw,nowc->nopc", jnp.asarray(mw, x.dtype), y)
    y = y[:, 2:-2, 2:-2, :]
    return y.reshape(*lead, y.shape[1], y.shape[2], C)


# ---------------------------------------------------------------------------
# MATLAB bicubic (antialiased) — `distortion: matlab`
# ---------------------------------------------------------------------------


def _cubic(x):
    x = np.abs(x)
    x2, x3 = x * x, x * x * x
    return ((1.5 * x3 - 2.5 * x2 + 1.0) * (x <= 1)
            + (-0.5 * x3 + 2.5 * x2 - 4.0 * x + 2.0) * ((x > 1) & (x <= 2)))


@lru_cache(maxsize=None)
def _matlab_weights(in_size: int, out_size: int, scale: float):
    """MATLAB imresize contribution matrix (antialiasing when scale<1).

    Matches models/modules/matlab_lr.py:34-465 semantics (symmetric /
    reflect-without-repeat boundary).
    """
    kernel_width = 4.0
    antialias = scale < 1.0
    kw = kernel_width / scale if antialias else kernel_width
    x = np.arange(1, out_size + 1, dtype=np.float64)
    u = x / scale + 0.5 * (1 - 1 / scale)
    left = np.floor(u - kw / 2)
    P = int(math.ceil(kw)) + 2
    idx = left[:, None] + np.arange(P)[None, :]  # (out, P)
    dist = u[:, None] - idx
    if antialias:
        wts = scale * _cubic(dist * scale)
    else:
        wts = _cubic(dist)
    wts /= wts.sum(axis=1, keepdims=True)
    # symmetric boundary (MATLAB-style reflection without edge repeat)
    idx = idx - 1  # 0-based
    idx = np.where(idx < 0, -idx - 1, idx)
    idx = np.where(idx > in_size - 1, 2 * in_size - 1 - idx, idx)
    m = np.zeros((out_size, in_size), np.float32)
    for i in range(out_size):
        for j in range(P):
            m[i, int(idx[i, j])] += wts[i, j]
    return m


def imresize_matlab(x, scale: float):
    """MATLAB-compatible bicubic resize of (..., H, W, C)."""
    *_, H, W, C = x.shape
    oh, ow = int(H * scale), int(W * scale)
    mh = jnp.asarray(_matlab_weights(H, oh, scale), x.dtype)
    mw = jnp.asarray(_matlab_weights(W, ow, scale), x.dtype)
    y = jnp.einsum("oh,...hwc->...owc", mh, x)
    return jnp.einsum("pw,...owc->...opc", mw, y)
