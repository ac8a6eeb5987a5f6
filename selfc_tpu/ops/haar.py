"""Orthogonal 2x2 Haar wavelet transform, channels-last.

Reproduces the reference HaarDownsampling (Inv_arch.py:44-84 /
SelfC_arch_inv.py:44-84) exactly, including:
  * the /4 normalization on the forward and none on the reverse
    (so rev(fwd(x)) == x),
  * the subband-major output channel order [LL_0..LL_C, H.., V.., D..],
  * the log-Jacobian values (elems/4 * log(1/16) fwd, * log 16 rev).

Implemented as strided slices + adds instead of a grouped conv — XLA fuses
this into a handful of vector ops, no conv kernels needed.
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def haar_forward(x):
    """(..., H, W, C) -> (..., H/2, W/2, 4C); subband-major channels."""
    a = x[..., 0::2, 0::2, :]
    b = x[..., 0::2, 1::2, :]
    c = x[..., 1::2, 0::2, :]
    d = x[..., 1::2, 1::2, :]
    ll = (a + b + c + d) * 0.25
    hh = (a - b + c - d) * 0.25  # horizontal detail
    vv = (a + b - c - d) * 0.25  # vertical detail
    dd = (a - b - c + d) * 0.25  # diagonal detail
    return jnp.concatenate([ll, hh, vv, dd], axis=-1)


def haar_inverse(y):
    """(..., h, w, 4C) -> (..., 2h, 2w, C); exact inverse of haar_forward."""
    C = y.shape[-1] // 4
    ll, hh, vv, dd = (y[..., i * C : (i + 1) * C] for i in range(4))
    a = ll + hh + vv + dd
    b = ll - hh + vv - dd
    c = ll + hh - vv - dd
    d = ll - hh - vv + dd
    *lead, h, w, _ = y.shape
    top = jnp.stack([a, b], axis=-2).reshape(*lead, h, 2 * w, C)
    bot = jnp.stack([c, d], axis=-2).reshape(*lead, h, 2 * w, C)
    return jnp.stack([top, bot], axis=-3).reshape(*lead, 2 * h, 2 * w, C)


def haar_log_jacobian(x_shape, rev: bool = False) -> float:
    """Reference jacobian: elements/4 * log(1/16) (fwd) or * log(16) (rev),
    where elements = C*H*W of the op input (Inv_arch.py:66-76)."""
    elems = x_shape[-1] * x_shape[-2] * x_shape[-3]
    return elems / 4.0 * (math.log(16.0) if rev else math.log(1.0 / 16.0))
