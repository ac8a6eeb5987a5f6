"""Evaluation metrics (PSNR / SSIM / MS-SSIM), channels-last jax.

Mirrors reference utils/util.py exactly:
  * calculate_psnr (:198-221): per-frame PSNR over all channels, range [0,1];
  * ssim / ms_ssim (:361-550): separable 11-tap gaussian (sigma 1.5), valid
    padding, MS weights [0.0448, 0.2856, 0.3001, 0.2363, 0.1333] with the
    reference's odd-size avg-pool padding rule;
  * rgb_to_ycbcr (Quantization_h265_rgb_stream.py:9-35). NB the reference's
    "Y-channel" metrics actually feed the full 3-channel YCbCr tensor into
    PSNR/SSIM (test_rescaling.py:109-123) — reproduced as-is.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def rgb_to_ycbcr(img):
    """(..., H, W, 3) RGB -> YCbCr (ITU-R BT.601, delta 0.5)."""
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = (b - y) * 0.564 + 0.5
    cr = (r - y) * 0.713 + 0.5
    return jnp.stack([y, cb, cr], axis=-1)


def psnr(img1, img2):
    """Per-frame PSNR. imgs: (N, H, W, C) in [0,1]; returns (N,)."""
    img1 = img1.astype(jnp.float32)
    img2 = img2.astype(jnp.float32)
    mse = jnp.mean((img1 - img2) ** 2, axis=(-3, -2, -1))
    return 20.0 * jnp.log10(1.0 / jnp.sqrt(mse))


def _gauss_win(size=11, sigma=1.5):
    coords = np.arange(size, dtype=np.float64) - size // 2
    g = np.exp(-(coords ** 2) / (2 * sigma ** 2))
    return (g / g.sum()).astype(np.float32)


def _gaussian_filter(x, win):
    """Separable valid-padding blur of (N,H,W,C) with per-channel kernel.

    Precision is pinned to HIGHEST: SSIM's variances are computed as
    E[X^2] - mu^2, and with the TPU's default bf16-operand convs the
    cancellation error (~1e-3) exceeds C2 (9e-4), driving the cs_map
    denominator negative and SSIM outside [-1, 1]. Metrics must not
    depend on the process-wide matmul-precision policy.
    """
    w = jnp.asarray(win)
    # conv along H then W (valid), channelwise
    x = jax.lax.conv_general_dilated(
        x,
        jnp.tile(w.reshape(-1, 1, 1, 1), (1, 1, 1, x.shape[-1])),
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=x.shape[-1],
        precision=jax.lax.Precision.HIGHEST,
    )
    x = jax.lax.conv_general_dilated(
        x,
        jnp.tile(w.reshape(1, -1, 1, 1), (1, 1, 1, x.shape[-1])),
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=x.shape[-1],
        precision=jax.lax.Precision.HIGHEST,
    )
    return x


def _ssim_full(X, Y, data_range=1.0, win_size=11, win_sigma=1.5):
    X = X.astype(jnp.float32)
    Y = Y.astype(jnp.float32)
    win = _gauss_win(win_size, win_sigma)
    C1 = (0.01 * data_range) ** 2
    C2 = (0.03 * data_range) ** 2
    mu1 = _gaussian_filter(X, win)
    mu2 = _gaussian_filter(Y, win)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 ** 2, mu2 ** 2, mu1 * mu2
    s1 = _gaussian_filter(X * X, win) - mu1_sq
    s2 = _gaussian_filter(Y * Y, win) - mu2_sq
    s12 = _gaussian_filter(X * Y, win) - mu1_mu2
    cs_map = (2 * s12 + C2) / (s1 + s2 + C2)
    ssim_map = ((2 * mu1_mu2 + C1) / (mu1_sq + mu2_sq + C1)) * cs_map
    return (
        ssim_map.mean(axis=(-3, -2, -1)),
        cs_map.mean(axis=(-3, -2, -1)),
    )


def ssim(X, Y, data_range=1.0):
    """(N,H,W,C) -> (N,) per-image SSIM (reference ssim, util.py:442-488)."""
    val, _ = _ssim_full(X, Y, data_range)
    return val


_MS_WEIGHTS = np.array([0.0448, 0.2856, 0.3001, 0.2363, 0.1333], np.float32)


def ms_ssim(X, Y, data_range=1.0):
    """(N,H,W,C) -> (N,) MS-SSIM (reference ms_ssim, util.py:491-550)."""
    weights = jnp.asarray(_MS_WEIGHTS)
    mcs = []
    val = None
    for level in range(len(_MS_WEIGHTS)):
        val, cs = _ssim_full(X, Y, data_range)
        mcs.append(cs)
        if level < len(_MS_WEIGHTS) - 1:
            # reference pads odd sizes before the 2x avg-pool (util.py:539-541)
            pad_h, pad_w = X.shape[-3] % 2, X.shape[-2] % 2
            pad = ((0, 0), (pad_h, pad_h), (pad_w, pad_w), (0, 0))
            X = jnp.pad(X, pad)
            Y = jnp.pad(Y, pad)
            X = jax.lax.reduce_window(
                X, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
            ) / 4.0
            Y = jax.lax.reduce_window(
                Y, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
            ) / 4.0
    mcs = jnp.stack(mcs, axis=0)  # (levels, N)
    return jnp.prod(
        (mcs[:-1] ** weights[:-1, None]) * (val ** weights[-1]), axis=0
    )
