"""Straight-through-estimator quantization.

Reference: models/modules/Quantization.py:4-26 — forward
``round(clip(x,0,1)*255)/255`` with identity backward.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def quantize_ste(x, quant_v: float = 255.0, is_clip: bool = True):
    # the 255-level rounding itself runs in fp32: bf16's 8 mantissa bits
    # would perturb the quantization boundaries by up to half a level.
    xq = x.astype(jnp.float32)
    if is_clip:
        xq = jnp.clip(xq, 0.0, 1.0)
    return (jnp.round(xq * quant_v) / quant_v).astype(x.dtype)


def _fwd(x, quant_v, is_clip):
    return quantize_ste(x, quant_v, is_clip), None


def _bwd(quant_v, is_clip, _, g):
    return (g,)


quantize_ste.defvjp(_fwd, _bwd)
