"""FrequencyAnalyzer: invertible-ish low/high frequency split.

Reference: SelfC_GMM_arch_inv.py:62-82 (k=4, rescaling) and
SelfC_Codec_arch_inv.py:78-98 (k=2, codec).

forward:  lf = area_down_k(x); hf = S2D_custom(x - area_up_k(lf))
          -> concat([lf, hf]) with 3 + 3*k*k channels.
reverse:  area_up_k(y[..,:3]) + pixel_shuffle_STD(y[..,3:])

The forward uses the reference's custom (s_h,s_w,c)-major unshuffle while
the reverse uses the standard torch PixelShuffle ordering — deliberately
kept asymmetric to match the trained reference semantics (see ops/shuffle).
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np

from .resize import area_down, area_up
from .shuffle import depth_to_space_std, space_to_depth


def _freq_forward_ref(x, k: int):
    lf = area_down(x, k)
    hf = space_to_depth(x - area_up(lf, k), k)
    return jnp.concatenate([lf, hf], axis=-1)


def _freq_inverse_ref(y, k: int, c_lf: int = 3):
    lf = y[..., :c_lf]
    hf = y[..., c_lf:]
    return area_up(lf, k) + depth_to_space_std(hf, k)


@lru_cache(maxsize=None)
def _fwd_kernel_np(k: int, C: int):
    """(k, k, C, C*(k*k+1)) strided-conv kernel computing
    [area_down | custom-s2d(x - area_up(area_down(x)))] in one op."""
    K = np.zeros((k, k, C, C * (k * k + 1)), np.float32)
    inv = 1.0 / (k * k)
    for c in range(C):
        K[:, :, c, c] = inv  # lf = block mean
    for sh in range(k):
        for sw in range(k):
            for c in range(C):
                f = C + ((sh * k + sw) * C + c)  # custom (s_h, s_w, c) order
                K[sh, sw, c, f] += 1.0
                K[:, :, c, f] -= inv  # minus the replicated mean
    return K


@lru_cache(maxsize=None)
def _inv_matrix_np(k: int, C: int):
    """(C*(k*k+1), k*k*C) matrix: latent -> block values in (s_h, s_w, c)
    order: out_block[(sh,sw,c)] = lf[c] + hf[c*k*k + sh*k + sw]
    (area_up + torch-PixelShuffle order)."""
    M = np.zeros((C * (k * k + 1), k * k * C), np.float32)
    for sh in range(k):
        for sw in range(k):
            for c in range(C):
                g = (sh * k + sw) * C + c
                M[c, g] = 1.0
                M[C + c * k * k + sh * k + sw, g] = 1.0
    return M


@lru_cache(maxsize=None)
def _inv_convt_kernel_np(k: int, C: int):
    """(k, k, C*(k*k+1), C) conv_transpose kernel realizing the inverse;
    spatial taps are flipped (conv_transpose applies the mirrored kernel)."""
    M = _inv_matrix_np(k, C)
    K2 = np.zeros((k, k, C * (k * k + 1), C), np.float32)
    for sh in range(k):
        for sw in range(k):
            for c in range(C):
                K2[k - 1 - sh, k - 1 - sw, :, c] = M[:, (sh * k + sw) * C + c]
    return K2


def freq_forward(x, k: int):
    """Each k x k block -> [mean | residual-unshuffle] as ONE stride-k
    conv (direct MXU lowering, no block transposes of a 3-lane tensor).
    Equivalent to the reference FrequencyAnalyzer forward
    (SelfC_GMM_arch_inv.py:62-77); exact vs the repeat/subtract/transpose
    composition (regression-tested)."""
    from jax import lax

    *lead, H, W, C = x.shape
    K = jnp.asarray(_fwd_kernel_np(k, C), x.dtype)
    y = lax.conv_general_dilated(
        x.reshape(-1, H, W, C), K,
        window_strides=(k, k), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y.reshape(*lead, H // k, W // k, C * (k * k + 1))


def freq_inverse(y, k: int, c_lf: int = 3):
    """Inverse as one stride-k conv_transpose (area_up + torch-PixelShuffle
    order in a single op — kept deliberately asymmetric with the forward's
    custom shuffle order, reference :78-82)."""
    from jax import lax

    *lead, h, w, CF = y.shape
    C = c_lf
    K2 = jnp.asarray(_inv_convt_kernel_np(k, C), y.dtype)
    out = lax.conv_transpose(
        y.reshape(-1, h, w, CF), K2, strides=(k, k), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out.reshape(*lead, h * k, w * k, C)
