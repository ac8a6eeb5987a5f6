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


def _global_module(kind: str, c: int, name: str, deform_radius=None):
    if kind == "nonlocal":
        return GlobalAgg(c, name=name)
    if kind == "deform":
        return DeformConvAgg(c, deform_radius=deform_radius, name=name)
    if kind == "grouped_global_deform":
        return GroupedGlobalDeformAgg(
            c, deform_radius=deform_radius, name=name
        )
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
        # cast fp32 masters to the activation dtype (mixed precision)
        return pointwise(x, w.astype(x.dtype), b.astype(x.dtype))


class STPNet(nn.Module):
    """Large / codec spatio-temporal prior.

    Split into ``backbone`` (D2DT chains + global aggregations) and
    ``tail`` (the GMM-parameter MLP) so the two phases can be profiled
    and optimized independently; ``__call__ = tail(backbone(lr))``.
    Param names are identical to the single-method layout.
    """

    scale: int = 4
    stp_blk_num: int = 6
    fh_loss: str = "gmm"  # 'gmm' | 'gmm_thin' | 'l2'
    gmm_k: int = 5
    global_module: str = "nonlocal"
    hidden_c: int = 64
    gc: int = 32
    # None = exact gather deform; int R = windowed TPU formulation
    deform_radius: int | None = None

    @property
    def hf_dim(self) -> int:
        return 3 * self.scale * self.scale

    def setup(self):
        c, gc = self.hidden_c, self.gc
        self.local_m1 = D2DT(3, c, gc, "plain_xavier")
        self.local_m2 = D2DT(c, c, gc, "plain_xavier")
        gm = self.global_module
        dr = self.deform_radius
        self.global_m1 = _global_module(gm, c, None, dr)
        self.global_m2 = _global_module(gm, c, None, dr)
        for i in range(self.stp_blk_num - 2):
            setattr(self, f"other_local_{i}", D2DT(c, c, gc, "plain_xavier"))
            setattr(self, f"other_global_{i}", _global_module(gm, c, None, dr))
        if self.fh_loss == "l2":
            self.tail_0 = _PW(c, self.hf_dim)
        elif self.fh_loss == "gmm":
            self.tail_0 = _PW(c, 2 * c)
            self.tail_1 = _PW(2 * c, 4 * c)
            self.tail_2 = _PW(4 * c, self.hf_dim * self.gmm_k * 3)
        elif self.fh_loss == "gmm_thin":
            self.tail_0 = _PW(c, c)
            self.tail_1 = _PW(c, c)
            self.tail_2 = _PW(c, self.hf_dim * self.gmm_k * 3)
        else:
            raise ValueError(self.fh_loss)

    def backbone(self, lr):  # (B,T,h,w,3) -> (B,T,h,w,hidden_c)
        x = self.local_m1(lr)
        if self.global_m1 is not None:
            x = self.global_m1(x)
        x = self.local_m2(x)
        if self.global_m2 is not None:
            x = self.global_m2(x)
        for i in range(self.stp_blk_num - 2):
            x = getattr(self, f"other_local_{i}")(x)
            gm = getattr(self, f"other_global_{i}")
            if gm is not None:
                x = gm(x)
        return x

    def tail(self, x):  # (B,T,h,w,hidden_c) -> raw GMM params / l2 mean
        if self.fh_loss == "l2":
            return self.tail_0(leaky_relu(x))
        if self.fh_loss == "gmm":
            x = self.tail_0(leaky_relu(x))
            x = self.tail_1(leaky_relu(x))
            return self.tail_2(leaky_relu(x))
        x = nn.relu(self.tail_0(leaky_relu(x)))
        x = nn.relu(self.tail_1(x))
        return self.tail_2(x)

    def __call__(self, lr):  # (B,T,h,w,3)
        return self.tail(self.backbone(lr))


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
