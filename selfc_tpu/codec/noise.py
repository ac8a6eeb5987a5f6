"""Codec-noise ablation (reference models/modules/Noise.py:17-38)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def add_noise(x, rng, magnitude: float = 1e-4, kind: str = "uniform"):
    if kind == "uniform":
        k1, k2 = jax.random.split(rng)
        sign = jax.random.bernoulli(k1, 0.5, x.shape).astype(x.dtype) * 2 - 1
        mag = jax.random.uniform(
            k2, x.shape, x.dtype, magnitude / 10.0, magnitude
        )
        noise = sign * mag
    elif kind == "gaussian":
        noise = jax.random.normal(rng, x.shape, x.dtype) * 2.0 * magnitude
    else:
        raise ValueError(kind)
    return x + noise
