"""Metric parity vs the reference formulas (torch-CPU ground truth)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as TF  # noqa: E402

from selfc_tpu.utils import metrics as M  # noqa: E402


def _win(size=11, sigma=1.5, channel=3):
    coords = torch.arange(size).float() - size // 2
    g = torch.exp(-(coords ** 2) / (2 * sigma ** 2))
    g = (g / g.sum()).reshape(1, 1, 1, -1)
    return g.repeat(channel, 1, 1, 1)


def _gauss(x, win):
    out = TF.conv2d(x, win, groups=x.shape[1])
    return TF.conv2d(out, win.transpose(2, 3), groups=x.shape[1])


def _torch_ssim(X, Y, data_range=1.0, full=False):
    # reference utils/util.py:392-439
    win = _win(channel=X.shape[1])
    C1 = (0.01 * data_range) ** 2
    C2 = (0.03 * data_range) ** 2
    mu1, mu2 = _gauss(X, win), _gauss(Y, win)
    s1 = _gauss(X * X, win) - mu1 ** 2
    s2 = _gauss(Y * Y, win) - mu2 ** 2
    s12 = _gauss(X * Y, win) - mu1 * mu2
    cs = (2 * s12 + C2) / (s1 + s2 + C2)
    ssim_map = ((2 * mu1 * mu2 + C1) / (mu1 ** 2 + mu2 ** 2 + C1)) * cs
    v = ssim_map.mean(-1).mean(-1).mean(-1)
    c = cs.mean(-1).mean(-1).mean(-1)
    return (v, c) if full else v


def _torch_msssim(X, Y, data_range=1.0):
    # reference utils/util.py:491-550
    weights = torch.tensor([0.0448, 0.2856, 0.3001, 0.2363, 0.1333])
    mcs = []
    for _ in range(5):
        v, c = _torch_ssim(X, Y, data_range, full=True)
        mcs.append(c)
        padding = (X.shape[2] % 2, X.shape[3] % 2)
        X = TF.avg_pool2d(X, kernel_size=2, padding=padding)
        Y = TF.avg_pool2d(Y, kernel_size=2, padding=padding)
    mcs = torch.stack(mcs, 0)
    return torch.prod(mcs[:-1] ** weights[:-1].unsqueeze(1) * v ** weights[-1], 0)


RNG = np.random.default_rng(3)


def _pair(n=2, h=96, w=96):
    a = RNG.random((n, h, w, 3)).astype(np.float32)
    b = np.clip(a + 0.05 * RNG.standard_normal(a.shape).astype(np.float32), 0, 1)
    return a, b


def _t(x):
    return torch.from_numpy(x).permute(0, 3, 1, 2).contiguous()


def test_psnr_matches_reference():
    a, b = _pair()
    got = np.asarray(M.psnr(jnp.asarray(a), jnp.asarray(b)))
    mse = ((a - b) ** 2).reshape(2, -1).mean(1)
    want = 20 * np.log10(1.0 / np.sqrt(mse))
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_ssim_matches_reference():
    a, b = _pair()
    got = np.asarray(M.ssim(jnp.asarray(a), jnp.asarray(b)))
    want = _torch_ssim(_t(a), _t(b)).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_ms_ssim_matches_reference():
    a, b = _pair(n=1, h=192, w=192)
    got = np.asarray(M.ms_ssim(jnp.asarray(a), jnp.asarray(b)))
    want = _torch_msssim(_t(a), _t(b)).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_ycbcr_matches_reference():
    a, _ = _pair(n=1, h=8, w=8)
    got = np.asarray(M.rgb_to_ycbcr(jnp.asarray(a)))
    r, g, b = a[..., 0], a[..., 1], a[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    want = np.stack([y, (b - y) * 0.564 + 0.5, (r - y) * 0.713 + 0.5], -1)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


@pytest.mark.tpu  # on-TPU lane: this failure class only reproduces on chip
def test_ssim_immune_to_low_precision_policy():
    """SSIM must stay correct (and in [-1,1]) under a process-wide low
    matmul-precision policy. On TPU the default conv precision truncates
    operands to bf16; E[X^2]-mu^2 then cancels catastrophically (error
    ~1e-3 > C2=9e-4), which produced validation SSIMs of 2.63 / -0.51
    during on-chip training. _gaussian_filter now pins HIGHEST."""
    a, b = _pair(h=96, w=96)
    want = _torch_ssim(_t(a), _t(b)).numpy()
    with jax.default_matmul_precision("bfloat16"):
        got = np.asarray(M.ssim(jnp.asarray(a), jnp.asarray(b)))
        got_bf16_in = np.asarray(
            M.ssim(jnp.asarray(a, jnp.bfloat16), jnp.asarray(b, jnp.bfloat16))
        )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    assert np.all(np.abs(got_bf16_in) <= 1.0 + 1e-6)
