"""Space<->depth reorderings, channels-last.

The reference uses TWO different channel orderings and we must reproduce
both exactly because coupling layers split on the channel axis:

* ``space_to_depth`` — block-position-major ``c_out = (s_h*S + s_w)*C + c``,
  the custom PixelUnshuffle / SpaceToDepth of the reference
  (SelfC_GMM_arch_inv.py:46-60, Subnet_constructor.py:242-257).
* ``depth_to_space_std`` — torch ``nn.PixelShuffle`` ordering
  ``c_in = c*S*S + s_h*S + s_w``.

Note: the reference's FrequencyAnalyzer pairs the *custom* unshuffle on the
forward with the *standard* shuffle on the reverse (SelfC_GMM_arch_inv.py:77
vs :82) — they are NOT inverses of each other; the trained network absorbs
the fixed permutation. We reproduce that asymmetry (see ops/freq.py).

All functions accept any number of leading dims: ``(..., H, W, C)``.
"""

from __future__ import annotations

import jax.numpy as jnp


def _perm(ndim, last5):
    """Permutation keeping leading dims fixed, reordering the last 5."""
    lead = list(range(ndim - 5))
    return lead + [ndim - 5 + i for i in last5]


def space_to_depth(x, S: int):
    """(..., H, W, C) -> (..., H/S, W/S, S*S*C) with (s_h, s_w, c)-major order."""
    *lead, H, W, C = x.shape
    x = x.reshape(*lead, H // S, S, W // S, S, C)
    # (H/S, s_h, W/S, s_w, C) -> (H/S, W/S, s_h, s_w, C)
    x = jnp.transpose(x, _perm(x.ndim, (0, 2, 1, 3, 4)))
    return x.reshape(*lead, H // S, W // S, S * S * C)


def depth_to_space(x, S: int):
    """Exact inverse of :func:`space_to_depth` (custom ordering)."""
    *lead, h, w, CSS = x.shape
    C = CSS // (S * S)
    x = x.reshape(*lead, h, w, S, S, C)
    # (h, w, s_h, s_w, C) -> (h, s_h, w, s_w, C)
    x = jnp.transpose(x, _perm(x.ndim, (0, 2, 1, 3, 4)))
    return x.reshape(*lead, h * S, w * S, C)


def space_to_depth_std(x, S: int):
    """torch ``F.pixel_unshuffle`` ordering: ``c_out = c*S*S + s_h*S + s_w``."""
    *lead, H, W, C = x.shape
    x = x.reshape(*lead, H // S, S, W // S, S, C)
    # (H/S, s_h, W/S, s_w, C) -> (H/S, W/S, C, s_h, s_w)
    x = jnp.transpose(x, _perm(x.ndim, (0, 2, 4, 1, 3)))
    return x.reshape(*lead, H // S, W // S, C * S * S)


def depth_to_space_std(x, S: int):
    """torch ``nn.PixelShuffle``: ``c_in = c*S*S + s_h*S + s_w``."""
    *lead, h, w, CSS = x.shape
    C = CSS // (S * S)
    x = x.reshape(*lead, h, w, C, S, S)
    # (h, w, C, s_h, s_w) -> (h, s_h, w, s_w, C)
    x = jnp.transpose(x, _perm(x.ndim, (0, 3, 1, 4, 2)))
    return x.reshape(*lead, h * S, w * S, C)
