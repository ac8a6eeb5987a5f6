"""Training losses (reference models/modules/loss.py:5-21)."""

from __future__ import annotations

import jax.numpy as jnp


def reconstruction_loss(x, target, losstype: str = "l2", eps: float = 1e-6):
    """l2 = mean squared; l1 = charbonnier sqrt(d^2+eps); both mean-reduced
    over all dims (reference ReconstructionLoss)."""
    if losstype == "l2":
        v = (x - target) ** 2
    elif losstype == "l1":
        d = x - target
        v = jnp.sqrt(d * d + eps)
    else:
        raise ValueError(losstype)
    return jnp.mean(v)
