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

        # Pair-carry fast path: callers may pass (x1, x2) already split —
        # the chain then never materializes the concatenated 51/131-channel
        # tensor between blocks (one concat at chain end instead of per
        # block). Numerically identical to the array path.
        as_pair = isinstance(x, tuple)
        if as_pair:
            x1, x2 = x
        else:
            x1, x2 = x[..., :s1], x[..., s1:]
        # When the subnets are D2DT dense chains, the coupling arithmetic
        # rides the chain kernels as fused epilogues: s never materializes
        # (H emits exp(+-s) directly) and the y1/y2 combines happen on the
        # conv5 accumulator — no extra HBM round-trips between the three
        # chains of a block. Identical math either way; jac is recovered as
        # sum(log(exp(s))).
        from ..ops.pallas_chain import (
            chain_v2_enabled,
            chain_v2_shapes_ok,
            fused_hg_pair,
            hg_enabled,
            hg_shapes_ok,
            prepack_stripe,
        )

        use_ep = (
            getattr(type(F), "SUPPORTS_EP", False)
            and x1.ndim == 5
            and chain_v2_enabled()
            and chain_v2_shapes_ok(x1.shape[1], x1.shape[2], x1.shape[3], s1, s2)
            and chain_v2_shapes_ok(x1.shape[1], x1.shape[2], x1.shape[3], s2, s1)
        )
        if prepack_stripe() and not use_ep:
            # inputs arrive W-packed: only the stripe-masked ep kernels are
            # correct (an unmasked fallback leaks convs across stripes) —
            # the packed driver pre-checks these shapes, so this is a bug
            raise RuntimeError(
                "prepacked coupling chain fell off the fused-ep path"
            )
        # H and G always share their input (y1 fwd / x1 rev): one fused
        # launch computes both chains AND the y2 combine, with exp(+-s)
        # kept on the fp32 accumulator (never round-tripped through HBM)
        use_hg = (
            use_ep
            and not prepack_stripe()  # hg kernel has no stripe masks
            and hg_enabled()
            and hg_shapes_ok(x1.shape[1], x1.shape[2], x1.shape[3], s1, s2)
        )
        if use_hg and not rev:
            y1 = F(x2, ep=("add", 1.0, x1, None))
            hw = H(y1, ep="weights")
            gw = G(y1, ep="weights")
            y2, s_exp = fused_hg_pair(y1, x2, *hw, *gw, self.clamp, False)
            jac = jnp.sum(jnp.log(s_exp))
        elif use_hg:
            hw = H(x1, ep="weights")
            gw = G(x1, ep="weights")
            y2, s_exp_n = fused_hg_pair(x1, x2, *hw, *gw, self.clamp, True)
            y1 = F(y2, ep=("sub_from", 1.0, x1, None))
            jac = jnp.sum(jnp.log(s_exp_n))
        elif use_ep and not rev:
            y1 = F(x2, ep=("add", 1.0, x1, None))
            s_exp = H(y1, ep=("sig_exp", self.clamp, None, None))
            y2 = G(y1, ep=("mul_add", 1.0, x2, s_exp))
            jac = jnp.sum(jnp.log(s_exp))
        elif use_ep:
            s_exp_n = H(x1, ep=("sig_exp_neg", self.clamp, None, None))
            y2 = G(x1, ep=("sub_mul", 1.0, x2, s_exp_n))
            y1 = F(y2, ep=("sub_from", 1.0, x1, None))
            jac = jnp.sum(jnp.log(s_exp_n))
        elif not rev:
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
        jac = (
            jac / (x1.shape[0] * x1.shape[1]) if x1.ndim == 5
            else jac / x1.shape[0]
        )
        if as_pair:
            return (y1, y2), jac
        return jnp.concatenate([y1, y2], axis=-1), jac
