"""Invertible rescaling / compression networks.

* ``SelfCNetGMM``   — the 'selfc_large' rescaling net: FrequencyAnalyzer(k=4)
                      + 8 coupling blocks + STPNet(GMM) prior
                      (reference SelfC_GMM_arch_inv.py:432-494).
* ``SelfCNetHaar``  — the small Haar-pyramid variant
                      (reference SelfC_arch_inv.py:276-338).
* ``SelfCNetCodec`` — the compression INN: FrequencyAnalyzer(k=2) + 4 blocks
                      + codec-flavored STPNet + optional de-artifact net
                      (reference SelfC_Codec_arch_inv.py:379-501; the codec
                      streaming itself lives in selfc_tpu/codec/).
* ``InvRescaleNet`` — the IRN baseline (reference Inv_arch.py:87-127).

All take channels-last video ``(B, T, H, W, C)``; T is static under jit.
Methods:
  encode(x)            -> (latent, log_jac)
  decode(lr)           -> (hr, recon_hf)     [draws from the prior via the
                                              'sample' PRNG collection]
  __call__(x, rev)     -> reference-compatible (out, aux) tuples
  roundtrip(x)         -> encode -> STE-quantize LR -> decode (train/eval path)
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp
import jax

from ..ops.freq import freq_forward, freq_inverse
from ..ops.gmm import gmm_neg_log_likelihood, gmm_sample, split_params
from ..ops.haar import haar_forward, haar_inverse
from ..ops.quantize import quantize_ste
from .blocks import D2DT, subnet
from .agg import GroupedGlobalDeformAgg
from .coupling import InvBlockExp, ScannedCouplingChain
from .stp import STPNet, STPNetSmall


def _chain_pair(blocks, pair, rev: bool, subnet_type: str):
    """Run the inv-block chain on an (x1, x2) pair, W-packing ONCE across
    the WHOLE chain when shapes allow (round-5 perf: one pack+unpack
    transpose pair per chain instead of one per chain call — kills most
    of the train step's data-formatting glue, docs/PERF.md).

    Correctness: the pack lays P batch images side by side along W; every
    fused-ep kernel masks conv taps at stripe boundaries (stripe_w), and
    ALL inter-block coupling arithmetic is elementwise, so the packed
    chain computes exactly the per-image chain. The per-block log-jac is
    normalized by the PACKED batch (B/P), so the sum is rescaled by 1/P."""
    from ..ops import pallas_chain as pc

    x1, x2 = pair
    P = 1
    if (
        x1.ndim == 5
        and subnet_type == "D2DTNet"
        and pc.pack_w_enabled()
        and pc.chain_v2_enabled()
        and not pc.hg_enabled()
    ):
        B, T, H, W = x1.shape[:4]
        C1, C2 = x1.shape[-1], x2.shape[-1]
        P = pc._pick_pack_w(B, W)
        if P > 1 and not (
            pc.chain_v2_shapes_ok(T, H, P * W, C1, C2)
            and pc.chain_v2_shapes_ok(T, H, P * W, C2, C1)
            and pc.chain_bwd_ok(H, P * W, C1)
            and pc.chain_bwd_ok(H, P * W, C2)
        ):
            P = 1
    it = list(reversed(blocks)) if rev else blocks
    jac = 0.0
    if P == 1:
        for blk in it:
            pair, j = blk(pair, rev)
            jac = jac + j
        return pair, jac
    W = x1.shape[3]
    pair = (pc._pack_w(x1, P), pc._pack_w(x2, P))
    with pc.prepacked_chain(W):
        for blk in it:
            pair, j = blk(pair, rev)
            jac = jac + j
    return (pc._unpack_w(pair[0], P), pc._unpack_w(pair[1], P)), jac / P


class SelfCNetGMM(nn.Module):
    """Flagship rescaling net (model type 'SelfC_GMM')."""

    scale: int = 4
    block_num: Sequence[int] = (4, 4)
    subnet_type: str = "D2DTNet"
    init_mode: str = "xavier"
    stp_blk_num: int = 6
    fh_loss: str = "gmm"
    gmm_k: int = 5
    global_module: str = "nonlocal"
    # None = exact gather deform_conv2d; int R = windowed TPU formulation
    # (only read when global_module is deform/grouped_global_deform)
    deform_radius: int | None = None
    # the snapshot disables the forward conditional NLL (reference :466-468);
    # set True to restore the paper's loss_c term.
    nll_enabled: bool = False
    # rematerialize each coupling block in the backward pass. Cuts the
    # training-step activation footprint ~16x (the un-rematerialized fp32
    # backward at batch 8 / GT 144 wants ~47G HBM vs the chip's 16G).
    # NB round-1's "85x slower" verdict on this flag was an artifact of the
    # broken axon sync: the honest cost is measured in tools/bench_train.py.
    remat: bool = False
    # compile the coupling chain as one lax.scan over stacked block params
    # (big compile-time cut; param layout changes to blocks/... stacked —
    # convert existing trees with utils.torch_import.stack_block_params)
    scan_blocks: bool = False

    @property
    def latent_channels(self) -> int:
        return 3 * (self.scale * self.scale + 1)

    @property
    def hf_dim(self) -> int:
        return 3 * self.scale * self.scale

    def setup(self):
        ctor = subnet(self.subnet_type, self.init_mode)
        if self.scan_blocks:
            self.scan_chain = ScannedCouplingChain(
                self.latent_channels, 3, ctor, sum(self.block_num)
            )
            self.inv_blocks = []
        else:
            blk_cls = (
                nn.remat(InvBlockExp, static_argnums=(2,)) if self.remat
                else InvBlockExp
            )
            self.inv_blocks = [
                blk_cls(self.latent_channels, 3, ctor)
                for _ in range(sum(self.block_num))
            ]
        self.stp_net = STPNet(
            scale=self.scale,
            stp_blk_num=self.stp_blk_num,
            fh_loss=self.fh_loss,
            gmm_k=self.gmm_k,
            global_module=self.global_module,
            deform_radius=self.deform_radius,
        )

    def encode(self, x):
        """HR (B,T,H,W,3) -> latent (B,T,H/s,W/s,3*(s^2+1)), log_jac."""
        y = freq_forward(x, self.scale)
        if self.scan_blocks:
            return self.scan_chain(y, False)
        # carry the (LR, HF) pair through the chain: the concatenated
        # 51-channel tensor materializes once at the end, not per block
        pair, jac = _chain_pair(
            self.inv_blocks, (y[..., :3], y[..., 3:]), False,
            self.subnet_type,
        )
        return jnp.concatenate(pair, axis=-1), jac

    def prior_params(self, lr):
        return self.stp_net(lr)

    def _sample_hf(self, params):
        if self.fh_loss == "l2":
            return params
        p = split_params(params, self.hf_dim, self.gmm_k)
        return gmm_sample(p, self.make_rng("sample"))

    def decode(self, lr):
        """LR (B,T,h,w,3) -> (HR (B,T,H,W,3), recon_hf)."""
        params = self.prior_params(lr)
        hf = self._sample_hf(params)
        return self.decode_with_hf(lr, hf)[0], hf

    def decode_with_hf(self, lr, hf):
        """Invert the coupling chain with given HF latents (exact inverse
        of encode up to the FrequencyAnalyzer's fixed shuffle asymmetry)."""
        if self.scan_blocks:
            y, _ = self.scan_chain(jnp.concatenate([lr, hf], axis=-1), True)
        else:
            pair, _ = _chain_pair(
                self.inv_blocks, (lr, hf), True, self.subnet_type
            )
            y = jnp.concatenate(pair, axis=-1)
        return freq_inverse(y, self.scale), y

    def nll(self, lr, hf):
        """Conditional NLL of true HF latents under the prior (loss_c)."""
        params = self.prior_params(lr)
        if self.fh_loss == "l2":
            return jnp.mean((hf - params) ** 2)
        return gmm_neg_log_likelihood(
            split_params(params, self.hf_dim, self.gmm_k), hf
        )

    def roundtrip(self, x):
        """encode -> split -> STE-quantize LR -> decode; the train/eval path
        (reference SelfC_model.py:148-176)."""
        y, _ = self.encode(x)
        lr_pre_quant = y[..., :3]
        hf_true = y[..., 3:]
        loss_c = (
            self.nll(lr_pre_quant, hf_true)
            if self.nll_enabled
            else jnp.zeros(())
        )
        lr = quantize_ste(lr_pre_quant)
        hr, _ = self.decode(lr)
        return {
            "lr_pre_quant": lr_pre_quant,
            "lr": lr,
            "hr": hr,
            "loss_c": loss_c,
        }

    def __call__(self, x, rev: bool = False):
        if not rev:
            y, _ = self.encode(x)
            loss_c = jnp.mean(y) * 0.0  # reference :468 disables fwd NLL
            return y, loss_c
        return self.decode(x)


class SelfCNetHaar(nn.Module):
    """Small Haar variant (model type 'SelfC')."""

    scale: int = 2
    block_num: Sequence[int] = (4,)
    subnet_type: str = "D2DTNet"
    init_mode: str = "xavier"
    stp_temporal_c: int = 32
    fh_loss: str = "gmm"
    gmm_mixture_num: int = 5
    condition_func: str = "D2DTNet"

    @property
    def down_num(self) -> int:
        return {2: 1, 4: 2, 8: 3}[self.scale]

    def setup(self):
        ctor = subnet(self.subnet_type, self.init_mode)
        blocks = []
        ch = 3
        for i in range(self.down_num):
            ch *= 4
            blocks.append(
                [InvBlockExp(ch, 3, ctor) for _ in range(self.block_num[i])]
            )
        self.level_blocks = blocks
        self.stp_net = STPNetSmall(
            stp_temporal_c=self.stp_temporal_c,
            fh_loss=self.fh_loss,
            gmm_k=self.gmm_mixture_num,
            condition_func=self.condition_func,
            hf_dim=3 * (4 ** self.down_num) - 3,
        )

    def encode(self, x):
        y = x
        jac = 0.0
        for level in range(self.down_num):
            y = haar_forward(y)
            for blk in self.level_blocks[level]:
                y, j = blk(y, False)
                jac = jac + j
        return y, jac

    def _sample_hf(self, params):
        if self.fh_loss == "l2":
            return params
        hf_dim = 3 * (4 ** self.down_num) - 3
        p = split_params(params, hf_dim, self.gmm_mixture_num)
        # small variant reparametrizes with std = exp(0.5*logvar)
        # (SelfC_arch_inv.py:178-185)
        return gmm_sample(p, self.make_rng("sample"), half_logvar=True)

    def decode(self, lr):
        params = self.stp_net(lr)
        hf = self._sample_hf(params)
        y = jnp.concatenate([lr, hf], axis=-1)
        for level in reversed(range(self.down_num)):
            for blk in reversed(self.level_blocks[level]):
                y, _ = blk(y, True)
            y = haar_inverse(y)
        return y, hf

    def nll(self, lr, hf):
        params = self.stp_net(lr)
        if self.fh_loss == "l2":
            return jnp.mean((hf - params) ** 2)
        hf_dim = 3 * (4 ** self.down_num) - 3
        return gmm_neg_log_likelihood(
            split_params(params, hf_dim, self.gmm_mixture_num), hf
        )

    def roundtrip(self, x):
        y, _ = self.encode(x)
        lr_pre_quant = y[..., :3]
        hf_true = y[..., 3:]
        loss_c = self.nll(lr_pre_quant, hf_true)
        lr = quantize_ste(lr_pre_quant)
        hr, _ = self.decode(lr)
        return {
            "lr_pre_quant": lr_pre_quant,
            "lr": lr,
            "hr": hr,
            "loss_c": loss_c,
        }

    def __call__(self, x, rev: bool = False):
        if not rev:
            y, _ = self.encode(x)
            lr = y[..., :3]
            hf = y[..., 3:]
            return y, self.nll(lr, hf)
        return self.decode(x)


class SelfCNetCodec(nn.Module):
    """Compression INN (model type 'SelfC_GMM_Codec'). The H.265 span is
    orchestrated by selfc_tpu/codec/pipeline.py around encode()/decode()."""

    scale: int = 2
    block_num: Sequence[int] = (4,)
    subnet_type: str = "D2DTNet"
    init_mode: str = "xavier"
    stp_blk_num: int = 4
    fh_loss: str = "l2"
    gmm_k: int = 5
    global_module: str = "nonlocal"
    stp_hidden_c: int = 24
    stp_denseblock_innerc: int = 12
    deart_net: bool = False
    deform_radius: int | None = None

    @property
    def latent_channels(self) -> int:
        return 3 * (self.scale * self.scale + 1)

    @property
    def hf_dim(self) -> int:
        return 3 * self.scale * self.scale

    def setup(self):
        ctor = subnet(self.subnet_type, self.init_mode)
        self.inv_blocks = [
            InvBlockExp(self.latent_channels, 3, ctor)
            for _ in range(sum(self.block_num))
        ]
        self.stp_net = STPNet(
            scale=self.scale,
            stp_blk_num=self.stp_blk_num,
            fh_loss=self.fh_loss,
            gmm_k=self.gmm_k,
            global_module=self.global_module,
            hidden_c=self.stp_hidden_c,
            gc=self.stp_denseblock_innerc,
            deform_radius=self.deform_radius,
        )
        if self.deart_net:
            # reference :395-401: D2DT(3->32) -> GroupedGlobalDeformAgg -> D2DT(32->3)
            self.deart_0 = D2DT(3, 32, init_mode="plain_xavier")
            self.deart_1 = GroupedGlobalDeformAgg(
                32, deform_radius=self.deform_radius
            )
            self.deart_2 = D2DT(32, 3, init_mode="plain_xavier")

    def encode(self, x):
        y = freq_forward(x, self.scale)
        # pair-carry: concat once at end
        pair, jac = _chain_pair(
            self.inv_blocks, (y[..., :3], y[..., 3:]), False,
            self.subnet_type,
        )
        return jnp.concatenate(pair, axis=-1), jac

    def _sample_hf(self, params):
        if self.fh_loss == "l2":
            return params
        p = split_params(params, self.hf_dim, self.gmm_k)
        return gmm_sample(p, self.make_rng("sample"))

    def decode(self, lr):
        if self.deart_net:
            lr = self.deart_2(self.deart_1(self.deart_0(lr)))
        params = self.stp_net(lr)
        hf = self._sample_hf(params)
        return self.decode_with_hf(lr, hf)[0], hf

    def decode_with_hf(self, lr, hf):
        pair, _ = _chain_pair(
            self.inv_blocks, (lr, hf), True, self.subnet_type
        )
        y = jnp.concatenate(pair, axis=-1)
        return freq_inverse(y, self.scale), y

    def roundtrip(self, x):
        """codec-free roundtrip (used for param init and smoke paths; the
        real codec span is inserted by train/codec_model.py)."""
        y, _ = self.encode(x)
        lr = quantize_ste(y[..., :3])
        hr, _ = self.decode(lr)
        return {"lr_pre_quant": y[..., :3], "lr": lr, "hr": hr,
                "loss_c": jnp.zeros(())}

    def __call__(self, x, rev: bool = False):
        if not rev:
            y, _ = self.encode(x)
            return y, jnp.mean(y) * 0.0
        return self.decode(x)


class InvRescaleNet(nn.Module):
    """IRN baseline (model type 'IRN', reference Inv_arch.py:87-127)."""

    scale: int = 4
    block_num: Sequence[int] = (4, 4)
    subnet_type: str = "DBNet"
    init_mode: str = "xavier"

    @property
    def down_num(self) -> int:
        return {2: 1, 4: 2, 8: 3}[self.scale]

    def setup(self):
        ctor = subnet(self.subnet_type, self.init_mode)
        blocks = []
        ch = 3
        for i in range(self.down_num):
            ch *= 4
            blocks.append(
                [InvBlockExp(ch, 3, ctor) for _ in range(self.block_num[i])]
            )
        self.level_blocks = blocks
        self._out_ch = ch

    def encode(self, x):
        y = x
        jac = 0.0
        for level in range(self.down_num):
            y = haar_forward(y)
            for blk in self.level_blocks[level]:
                y, j = blk(y, False)
                jac = jac + j
        return y, jac

    def decode(self, lr):
        hf_ch = self._out_ch - 3
        shape = (*lr.shape[:-1], hf_ch)
        hf = jax.random.uniform(self.make_rng("sample"), shape, lr.dtype)
        y = jnp.concatenate([lr, hf], axis=-1)
        for level in reversed(range(self.down_num)):
            for blk in reversed(self.level_blocks[level]):
                y, _ = blk(y, True)
            y = haar_inverse(y)
        return y, None

    def __call__(self, x, rev: bool = False):
        if not rev:
            y, _ = self.encode(x)
            return y[..., :3], jnp.mean(y[..., 3:] ** 2)
        return self.decode(x)
