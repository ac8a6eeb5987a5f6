"""Training losses (reference models/modules/loss.py:5-124)."""

from __future__ import annotations

import jax
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


def gan_loss(logits, target_is_real: bool, gan_type: str = "gan",
             real_label_val: float = 1.0, fake_label_val: float = 0.0):
    """GANLoss (reference loss.py:69-101): vanilla BCE-with-logits, lsgan
    MSE, or wgan-gp mean."""
    if gan_type in ("gan", "ragan"):
        target = real_label_val if target_is_real else fake_label_val
        # BCEWithLogits
        return jnp.mean(
            jnp.maximum(logits, 0) - logits * target
            + jnp.log1p(jnp.exp(-jnp.abs(logits)))
        )
    if gan_type == "lsgan":
        target = real_label_val if target_is_real else fake_label_val
        return jnp.mean((logits - target) ** 2)
    if gan_type == "wgan-gp":
        return -jnp.mean(logits) if target_is_real else jnp.mean(logits)
    raise NotImplementedError(f"GAN type [{gan_type}] is not found")


def gradient_penalty(disc_fn, interp):
    """WGAN-GP gradient penalty (reference GradientPenaltyLoss,
    loss.py:104-124): ((||d D/d x||_2 - 1)^2).mean()."""

    def scalar_sum(x):
        return jnp.sum(disc_fn(x))

    g = jax.grad(scalar_sum)(interp)
    g = g.reshape(g.shape[0], -1)
    norm = jnp.sqrt(jnp.sum(g ** 2, axis=1) + 1e-12)
    return jnp.mean((norm - 1.0) ** 2)
