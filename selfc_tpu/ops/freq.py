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

from .resize import area_down, area_up
from .shuffle import depth_to_space_std, space_to_depth
import jax.numpy as jnp


def freq_forward(x, k: int):
    lf = area_down(x, k)
    hf = space_to_depth(x - area_up(lf, k), k)
    return jnp.concatenate([lf, hf], axis=-1)


def freq_inverse(y, k: int, c_lf: int = 3):
    lf = y[..., :c_lf]
    hf = y[..., c_lf:]
    return area_up(lf, k) + depth_to_space_std(hf, k)
