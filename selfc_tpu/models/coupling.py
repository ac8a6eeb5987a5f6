"""Affine coupling block (the INN workhorse).

Reference InvBlockExp (SelfC_GMM_arch_inv.py:8-41 and byte-identical copies
in Inv_arch.py / SelfC_arch_inv.py / SelfC_Codec_arch_inv.py):

  forward: y1 = x1 + F(x2);  s = clamp*(2*sigmoid(H(y1)) - 1)
           y2 = x2 * exp(s) + G(y1)
  reverse: s = clamp*(2*sigmoid(H(x1)) - 1)
           y2 = (x2 - G(x1)) * exp(-s);  y1 = x1 - F(y2)
  log-jac: +-sum(s) / (B*T)

x splits on the channel (last) axis into (split1 = 3 LR channels,
split2 = the high-frequency rest).
"""

from __future__ import annotations

from typing import Any, Callable

import flax.linen as nn
import jax
import jax.numpy as jnp


class ScannedCouplingChain(nn.Module):
    """The whole coupling chain as ONE ``nn.scan`` over stacked block
    params: the chain traces/compiles once instead of once per block
    (8 blocks => ~8x less HLO for the hot path). The reverse direction
    shares the same stacked params through a ``map_variables`` axis flip.

    Param layout: ``blocks/...`` with a leading length-N stacking axis —
    convert per-block trees with utils/torch_import.stack_block_params.
    """

    channel_num: int
    channel_split_num: int
    subnet_ctor: Callable[..., Any]
    n_blocks: int

    @nn.compact
    def __call__(self, x, rev: bool = False):
        Scan = nn.scan(
            InvBlockExp,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            length=self.n_blocks,
            in_axes=(nn.broadcast,),
        )
        args = (self.channel_num, self.channel_split_num, self.subnet_ctor)
        if not rev:
            y, jacs = Scan(*args, name="blocks")(x, False)
        else:
            flip = lambda vs: jax.tree.map(lambda a: a[::-1], vs)  # noqa: E731
            Rev = nn.map_variables(
                Scan, "params", trans_in_fn=flip, trans_out_fn=flip,
                mutable=True,
            )
            y, jacs = Rev(*args, name="blocks")(x, True)
        return y, jnp.sum(jacs)


class InvBlockExp(nn.Module):
    channel_num: int
    channel_split_num: int
    subnet_ctor: Callable[..., Any]  # (c_in, c_out, gc=..., name=...) -> Module
    clamp: float = 1.0

    @nn.compact
    def __call__(self, x, rev: bool = False):
        s1 = self.channel_split_num
        s2 = self.channel_num - s1
        F = self.subnet_ctor(s2, s1, name="F")
        G = self.subnet_ctor(s1, s2, name="G")
        H = self.subnet_ctor(s1, s2, name="H")

        x1, x2 = x[..., :s1], x[..., s1:]
        if not rev:
            y1 = x1 + F(x2)
            s = self.clamp * (2.0 * jax.nn.sigmoid(H(y1)) - 1.0)
            y2 = x2 * jnp.exp(s) + G(y1)
            jac = jnp.sum(s)
        else:
            s = self.clamp * (2.0 * jax.nn.sigmoid(H(x1)) - 1.0)
            y2 = (x2 - G(x1)) * jnp.exp(-s)
            y1 = x1 - F(y2)
            jac = -jnp.sum(s)
        # reference divides by the flattened frame-batch B*T
        jac = jac / (x.shape[0] * x.shape[1]) if x.ndim == 5 else jac / x.shape[0]
        return jnp.concatenate([y1, y2], axis=-1), jac
