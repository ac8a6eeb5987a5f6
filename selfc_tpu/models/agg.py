"""Temporal aggregation modules for the STP prior.

* GlobalAgg — non-local T x T temporal attention over pooled frame tokens
  (reference SelfC_GMM_arch_inv.py:257-285; codec copy :103-131). This is
  the `global_module: nonlocal` used by every shipped config.
* DeformConvAgg / GroupedGlobalDeformAgg — modulated-deformable-conv
  aggregation (reference :90-254). torchvision's CUDA `deform_conv2d` has
  no XLA primitive; we lower it to a bilinear gather + 3x3 accumulation
  (see ops/deform.py).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.conv import (
    conv2d,
    leaky_relu,
    pointwise,
    torch_default_b as _torch_default_b,
    torch_default_w as _torch_default_w,
    zeros_init,
)
from ..ops.deform import deform_conv2d_pallas, deform_conv2d_windowed
from ..ops.resize import adaptive_avg_pool2d


def _deform_fn(radius):
    """Exact deform conv (radius None) or the windowed formulation
    (ops/deform.py:deform_conv2d_windowed) with the total tap displacement
    bounded by ``radius``. The exact default routes through the Pallas
    gather kernel (deform_conv2d_pallas: VMEM-resident frame, in-kernel
    row gather + 9 accumulated MXU dots) and falls back to the XLA
    gather composition when the shape/backend doesn't qualify; the
    windowed variant trades unbounded offsets for pure shift/VPU math
    (docs/PERF.md "Deformable conv")."""
    if radius:
        def fn(x, off, mod, w, b):
            return deform_conv2d_windowed(x, off, mod, w, b, radius=radius)
        return fn
    return deform_conv2d_pallas


def _scan_pair_sum(dconv, x_frame, offs, mods, w, b):
    """sum_t deform(x_frame, offs[t], mods[t]) via lax.scan — one traced
    body instead of T inlined deform convs (the reference's python loop,
    SelfC_GMM_arch_inv.py:240-250, is a graph-size hazard at T^2 calls)."""
    acc0 = jnp.zeros(x_frame.shape[:3] + (w.shape[-1],), x_frame.dtype)

    def body(acc, om):
        o, m = om
        return acc + dconv(x_frame, o, m, w, b), None

    acc, _ = jax.lax.scan(body, acc0, (offs, mods))
    return acc


class GlobalAgg(nn.Module):
    """x: (B, T, H, W, C) -> same shape; residual temporal attention."""

    c: int

    @nn.compact
    def __call__(self, x):
        B, T, H, W, C = x.shape
        # fp32 master params cast down to the activation dtype — without
        # this, einsum promotion silently upgrades everything downstream
        # of the first agg to fp32 under mixed-precision training
        dt = x.dtype
        w1 = self.param("proj1_w", _torch_default_w, (C, C)).astype(dt)
        b1 = self.param("proj1_b", _torch_default_b(C), (C,)).astype(dt)
        x_proj1 = pointwise(x, w1, b1)

        pooled = adaptive_avg_pool2d(x, (32, 32))  # (B,T,32,32,C)
        pooled = pooled.reshape(B, T, 32 * 32, C)
        wf = self.param("fc_w", _torch_default_w, (32 * 32, 1)).astype(dt)
        bf = self.param("fc_b", _torch_default_b(32 * 32), (1,)).astype(dt)
        tokens = jnp.einsum("btpc,po->btc", pooled, wf) + bf[0]  # (B,T,C)

        w2 = self.param("proj2_w", _torch_default_w, (C, C)).astype(dt)
        b2 = self.param("proj2_b", _torch_default_b(C), (C,)).astype(dt)
        w3 = self.param("proj3_w", _torch_default_w, (C, C)).astype(dt)
        b3 = self.param("proj3_b", _torch_default_b(C), (C,)).astype(dt)
        q = tokens @ w2 + b2
        k = tokens @ w3 + b3
        # softmax stays fp32 (T x T is tiny; exp in bf16 costs accuracy)
        logits = (q @ k.transpose(0, 2, 1)).astype(jnp.float32) / C
        attn = jax.nn.softmax(logits, axis=-1).astype(dt)  # (B,T,T)
        # reference: out frame j = x_j + sum_i attn[i, j] * proj1(x_i)
        weighted = jnp.einsum("bihwc,bij->bjhwc", x_proj1, attn)
        return x + weighted


class DeformConvAgg(nn.Module):
    """Temporal aggregation via modulated deformable conv
    (reference DeformConvAgg, SelfC_GMM_arch_inv.py:188-254).

    ``deform_radius`` (config network_G.deform_radius) switches the
    per-pixel gather to the windowed TPU formulation; None = exact."""

    c: int
    deform_radius: int | None = None

    @nn.compact
    def __call__(self, x):
        B, T, H, W, C = x.shape
        K = 3
        x_stacked = x.transpose(0, 2, 3, 1, 4).reshape(B, H, W, T * C)
        dt = x.dtype  # fp32 masters cast to the activation dtype
        off_w = self.param(
            "offset_w", zeros_init, (K, K, T * C, 2 * K * K * T * T)
        ).astype(dt)
        off_b = self.param(
            "offset_b", zeros_init, (2 * K * K * T * T,)
        ).astype(dt)
        mod_w = self.param(
            "modulator_w", zeros_init, (K, K, T * C, K * K * T * T)
        ).astype(dt)
        mod_b = self.param(
            "modulator_b", zeros_init, (K * K * T * T,)
        ).astype(dt)
        reg_w = self.param(
            "regular_w", _torch_default_w, (K, K, C, C)
        ).astype(dt)
        reg_b = self.param(
            "regular_b", _torch_default_b(C * K * K), (C,)
        ).astype(dt)
        proj_w = self.param("proj_w", zeros_init, (C, C)).astype(dt)

        offset = conv2d(x_stacked, off_w, off_b)  # (B,H,W,2KK*T*T)
        modulator = 2.0 * jax.nn.sigmoid(conv2d(x_stacked, mod_w, mod_b))
        offset = offset.reshape(B, H, W, T * T, 2 * K * K)
        modulator = modulator.reshape(B, H, W, T * T, K * K)
        # reference: out[t1] = sum_t2 deform(x[t1], offset_chunk(t1*T+t2))
        # (x_repeat repeats each frame T times; SelfC_GMM_arch_inv.py:240-250)
        dconv = _deform_fn(self.deform_radius)
        agg = []
        for t1 in range(T):
            offs = jnp.moveaxis(
                offset[..., t1 * T:(t1 + 1) * T, :], 3, 0
            )  # (T,B,H,W,2KK)
            mods = jnp.moveaxis(modulator[..., t1 * T:(t1 + 1) * T, :], 3, 0)
            agg.append(
                _scan_pair_sum(dconv, x[:, t1], offs, mods, reg_w, reg_b)
            )
        agg = jnp.stack(agg, axis=1)
        return x + pointwise(agg, proj_w)


class GroupedGlobalDeformAgg(nn.Module):
    """Grouped global context + deformable aggregation
    (reference GroupedGlobalDeformAgg, SelfC_GMM_arch_inv.py:90-186)."""

    c: int
    groups: int = 4
    deform_radius: int | None = None

    @nn.compact
    def __call__(self, x):
        B, T, H, W, C = x.shape
        g = self.groups
        cg = C // g
        gcp = T * cg
        K = 3
        # grouped global context reallocation over (T*cg) channels per group
        xg = x.reshape(B, T, H, W, g, cg)
        xg = xg.transpose(0, 4, 2, 3, 1, 5).reshape(B * g, H, W, T * cg)
        dt = x.dtype  # fp32 masters cast to the activation dtype
        r1_w = self.param(
            "realloc1_w", _torch_default_w, (3, 3, gcp, gcp)
        ).astype(dt)
        r1_b = self.param(
            "realloc1_b", _torch_default_b(gcp * 9), (gcp,)
        ).astype(dt)
        r2_w = self.param("realloc2_w", zeros_init, (3, 3, gcp, gcp)).astype(dt)
        r2_b = self.param("realloc2_b", zeros_init, (gcp,)).astype(dt)
        h = leaky_relu(conv2d(xg, r1_w, r1_b), 0.2)
        h = conv2d(h, r2_w, r2_b)
        xe = xg + h
        xe = xe.reshape(B, g, H, W, T, cg).transpose(0, 4, 2, 3, 1, 5)
        x_enh = xe.reshape(B, T, H, W, C)

        off_w = self.param(
            "offset_w", zeros_init, (K, K, C, 2 * K * K * T)
        ).astype(dt)
        off_b = self.param("offset_b", zeros_init, (2 * K * K * T,)).astype(dt)
        mod_w = self.param(
            "modulator_w", zeros_init, (K, K, C, K * K * T)
        ).astype(dt)
        mod_b = self.param("modulator_b", zeros_init, (K * K * T,)).astype(dt)
        reg_w = self.param("regular_w", zeros_init, (K, K, C, C)).astype(dt)
        reg_b = self.param("regular_b", zeros_init, (C,)).astype(dt)

        xf = x_enh.reshape(B * T, H, W, C)
        offset = conv2d(xf, off_w, off_b).reshape(B, T, H, W, T, 2 * K * K)
        modulator = 2.0 * jax.nn.sigmoid(conv2d(xf, mod_w, mod_b)).reshape(
            B, T, H, W, T, K * K
        )
        dconv = _deform_fn(self.deform_radius)
        agg = []
        for t_out in range(T):
            # reference repeats the *source* frame across t_in
            offs = jnp.moveaxis(offset[:, t_out], 3, 0)  # (T,B,H,W,2KK)
            mods = jnp.moveaxis(modulator[:, t_out], 3, 0)
            agg.append(
                _scan_pair_sum(dconv, x_enh[:, t_out], offs, mods,
                               reg_w, reg_b)
            )
        agg = jnp.stack(agg, axis=1)
        return x_enh + agg
