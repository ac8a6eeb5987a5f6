"""STPNet — the self-conditioned spatio-temporal prior over HF latents.

Three variants, mirroring the reference:

* ``STPNet``      — the 'large' rescaling prior (SelfC_GMM_arch_inv.py:289-430):
                    hidden 64, gc 32, interleaved GlobalAgg, 3-conv GMM MLP tail.
* codec flavor    — same topology with config channels (stp_hidden_c /
                    stp_denseblock_innerc) and an optional gmm_thin tail
                    (SelfC_Codec_arch_inv.py:235-374).
* ``STPNetSmall`` — the Haar-variant prior (SelfC_arch_inv.py:90-198):
                    blk1 = 3 stacked D2DT (3->12->24->48), blk2, hf_dim=9,
                    half-logvar reparameterization.

Input is the LR video ``(B, T, h, w, 3)``; output is the raw tail tensor:
``(B,T,h,w,hf_dim)`` for fh_loss='l2' or ``(B,T,h,w,hf_dim*K*3)`` for GMM.
Sampling / NLL are pure functions in ops/gmm.py, seeded by an explicit
PRNG key (the reference drew CUDA-global noise, SelfC_GMM_arch_inv.py:412-417).
"""

from __future__ import annotations

import flax.linen as nn

from ..ops.conv import leaky_relu, pointwise, torch_default_b, torch_default_w
from .agg import DeformConvAgg, GlobalAgg, GroupedGlobalDeformAgg
from .blocks import D2DT, FeatureCollapse


def _global_module(kind: str, c: int, name: str):
    if kind == "nonlocal":
        return GlobalAgg(c, name=name)
    if kind == "deform":
        return DeformConvAgg(c, name=name)
    if kind == "grouped_global_deform":
        return GroupedGlobalDeformAgg(c, name=name)
    return None


class _PW(nn.Module):
    """1x1x1 conv with torch-default init (tail convs are never re-inited
    in the reference)."""

    c_in: int
    c_out: int

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", torch_default_w, (self.c_in, self.c_out))
        b = self.param("bias", torch_default_b(self.c_in), (self.c_out,))
        return pointwise(x, w, b)


class STPNet(nn.Module):
    """Large / codec spatio-temporal prior."""

    scale: int = 4
    stp_blk_num: int = 6
    fh_loss: str = "gmm"  # 'gmm' | 'gmm_thin' | 'l2'
    gmm_k: int = 5
    global_module: str = "nonlocal"
    hidden_c: int = 64
    gc: int = 32

    @property
    def hf_dim(self) -> int:
        return 3 * self.scale * self.scale

    @nn.compact
    def __call__(self, lr):  # (B,T,h,w,3)
        c, gc = self.hidden_c, self.gc
        x = D2DT(3, c, gc, "plain_xavier", name="local_m1")(lr)
        gm = _global_module(self.global_module, c, "global_m1")
        if gm is not None:
            x = gm(x)
        x = D2DT(c, c, gc, "plain_xavier", name="local_m2")(x)
        gm = _global_module(self.global_module, c, "global_m2")
        if gm is not None:
            x = gm(x)
        for i in range(self.stp_blk_num - 2):
            x = D2DT(c, c, gc, "plain_xavier", name=f"other_local_{i}")(x)
            gm = _global_module(self.global_module, c, f"other_global_{i}")
            if gm is not None:
                x = gm(x)

        if self.fh_loss == "l2":
            x = leaky_relu(x)
            return _PW(c, self.hf_dim, name="tail_0")(x)
        if self.fh_loss == "gmm":
            x = leaky_relu(x)
            x = _PW(c, 2 * c, name="tail_0")(x)
            x = leaky_relu(x)
            x = _PW(2 * c, 4 * c, name="tail_1")(x)
            x = leaky_relu(x)
            return _PW(4 * c, self.hf_dim * self.gmm_k * 3, name="tail_2")(x)
        if self.fh_loss == "gmm_thin":
            x = leaky_relu(x)
            x = _PW(c, c, name="tail_0")(x)
            x = nn.relu(x)
            x = _PW(c, c, name="tail_1")(x)
            x = nn.relu(x)
            return _PW(c, self.hf_dim * self.gmm_k * 3, name="tail_2")(x)
        raise ValueError(self.fh_loss)


class STPNetSmall(nn.Module):
    """Haar-variant prior (reference SelfC_arch_inv.py:90-198)."""

    stp_temporal_c: int = 32
    fh_loss: str = "gmm"
    gmm_k: int = 5  # opt['gmm_mixture_num']
    condition_func: str = "D2DTNet"
    hf_dim: int = 9

    @nn.compact
    def __call__(self, lr):
        if self.condition_func == "D2DTNet":
            x = D2DT(3, 12, name="blk1_0")(lr)
            x = D2DT(12, 24, name="blk1_1")(x)
            x = D2DT(24, 48, name="blk1_2")(x)
            x = D2DT(48, self.stp_temporal_c, name="blk2")(x)
        else:
            x = FeatureCollapse(3, 12, name="blk1")(lr)
            x = FeatureCollapse(12, self.stp_temporal_c, name="blk2")(x)

        c = self.stp_temporal_c
        if self.fh_loss == "l2":
            x = leaky_relu(x)
            return _PW(c, self.hf_dim, name="tail_0")(x)
        x = leaky_relu(x)
        x = _PW(c, c, name="tail_0")(x)
        x = leaky_relu(x)
        x = _PW(c, c, name="tail_1")(x)
        x = leaky_relu(x)
        return _PW(c, self.hf_dim * self.gmm_k * 3, name="tail_2")(x)
