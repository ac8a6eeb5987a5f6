"""Fused Pallas kernel for the 5-conv dense chain (the INN hot loop).

The reference's hot path is DenseBlock/D2DTInput: four growing 3x3 convs
with LeakyReLU + one temporal (3,1,1) projection, chained through channel
concats (Subnet_constructor.py:98-133). On TPU the XLA lowering of this
chain is memory-bound: every conv materializes its input concat and its
32-channel output in HBM, and the small channel counts (3..179) leave most
of each MXU tile empty.

This kernel computes the four spatial convs for one (frame, row-tile) in a
single fused pass:

* the growing concat lives in ONE VMEM work buffer: input x at lanes
  [0, X) (X = C rounded up to 32), conv outputs x1..x4 appended at
  32-lane-aligned offsets — each conv's input is one contiguous K-slice
  and no concat ever touches HBM;
* each 3x3 conv runs as THREE MXU dots (one per kernel row dy, input
  row-shifted — row shifts on the untiled dim are free) that accumulate in
  fp32; the three kernel columns dx are N-packed into one 96-lane output,
  leaving only three cheap shifted adds on the VPU. Measured against the
  alternatives on a v5e: ~2.3x faster than a 9-tap output-side N-pack
  (whose 9 lane-rotations dominate) and ~1.5-1.7x faster than the best
  XLA formulation;
* bias + LeakyReLU fuse on the fp32 accumulator before the result is
  written back to the work buffer;
* row tiles overlap by the chain's receptive field (4 rows each side) via
  ``pl.Element`` windows, so intermediate activations never leave VMEM.

The temporal conv5 runs outside (it needs cross-T context; it is already
matmul-shaped) on the (x, x1..x4) pair without materializing their concat.

Gradients: the kernel is forward-only; ``fused_dense_spatial`` carries a
``jax.custom_vjp`` whose backward re-derives the chain through the XLA
formulation (rematerialization — no extra residuals are saved).
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GC = 32  # chain growth per conv — fixed across every reference block family


def _mxu_precision(a):
    """Precision for an in-kernel MXU dot. Pallas dots must NOT inherit
    the process-wide matmul-precision policy for sub-f32 operands:
    test_rescaling.py pins jax_default_matmul_precision='highest' for
    reference-grade fp32 eval, and Mosaic rejects contract_precision<fp32>
    on bf16 operands ("Bad lhs type"). bf16 contracts at DEFAULT (native
    MXU bf16 multiply, f32 accumulate via preferred_element_type); f32
    operands keep inheriting the global policy (None)."""
    return None if a.dtype == jnp.float32 else jax.lax.Precision.DEFAULT


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def ep_in_input_dtype() -> bool:
    """EXPERIMENT (default off, `SELFC_TPU_PALLAS_EP_IN_DT=1` enables):
    run the dx-combine + bias + LeakyReLU epilogue in the INPUT dtype
    (bf16 at runtime) instead of fp32; the dy dots still accumulate fp32.
    Measured a WASH on v5e (H/G 1.12 vs 1.02 ms, STP 1.25 vs 1.29): the
    VPU computes bf16 elementwise ops at f32 rate (unpack/repack), so
    halving the nominal traffic buys nothing and the extra casts cost.
    Also note the v5e VPU lacks bf16 compare/select and sublane rotates —
    the bf16 branch uses max(x, s*x) LeakyReLU and multiply-masks."""
    return os.environ.get("SELFC_TPU_PALLAS_EP_IN_DT", "") == "1"


def chain_fused_enabled() -> bool:
    """Fused chain is ON by default on TPU; SELFC_TPU_PALLAS=0 disables,
    =1 forces (interpret mode off-TPU, used by tests)."""
    flag = os.environ.get("SELFC_TPU_PALLAS", "")
    if flag == "0":
        return False
    if flag == "1":
        return True
    return jax.default_backend() == "tpu"


def _pick_tile_h(H: int) -> int | None:
    for th in (24, 16, 12, 8, 6, 32, 4):
        if H % th == 0:
            return th
    return None


def chain_shapes_ok(H: int, W: int, C: int) -> bool:
    th = _pick_tile_h(H)
    if th is None or W % 16 != 0:
        return False
    wp = _round_up(W + 2, 16)
    X = _round_up(C, GC)
    # VMEM budget: work buffer + fp32 dx-packed partial + double-buffered
    # x window + output block
    work = (th + 8) * wp * _round_up(X + 4 * GC, 128) * 2
    part = (th + 6) * wp * 128 * 4
    xwin = 2 * (th + 8) * wp * _round_up(X, 128) * 2
    outb = 2 * th * wp * 128 * 2
    return work + part + xwin + outb < 13 * 2 ** 20


def _prep_weight(w, C: int, X: int):
    """(3, 3, Cin, GC) HWIO -> (3 dy, X + (Cin - C), 3*GC): kernel rows dy
    stay a separate axis (they ride MXU accumulation over row-shifted
    inputs); kernel columns dx pack into the 96-lane output; zero rows pad
    the x segment from C to X so conv inputs stay lane-aligned."""
    Cin = w.shape[2]
    wt = jnp.transpose(w, (0, 2, 1, 3)).reshape(3, Cin, 3 * GC)
    if X == C:
        return wt
    pad = jnp.zeros((3, X - C, 3 * GC), w.dtype)
    return jnp.concatenate([wt[:, :C], pad, wt[:, C:]], axis=1)


def _chain_kernel(x_ref, w1, w2, w3, w4, b_ref, o_ref, work,
                  *, TH, W, WP, X, H, slope):
    i_tile = pl.program_id(1)
    f32 = jnp.float32
    w_refs = (w1, w2, w3, w4)

    # x (already zero-padded to X lanes + halo rows/cols in XLA) fills
    # lanes [0, X); only the halo columns of the conv-output lanes need
    # explicit zeroing (scratch is stale across grid instances)
    work[:, :, :X] = x_ref[0]
    work[:, 0:1, X:] = jnp.zeros((TH + 8, 1, 4 * GC), work.dtype)
    work[:, W + 1:WP, X:] = jnp.zeros((TH + 8, WP - W - 1, 4 * GC),
                                      work.dtype)

    for i in range(1, 5):
        kin = X + GC * (i - 1)
        ri0 = i - 1                      # first input row of this conv
        ro0, ro1 = i, TH + 8 - i         # rows its output covers
        r_out = ro1 - ro0
        w = w_refs[i - 1]
        # dy-sum on the MXU: three row-shifted input dots accumulate in f32
        part = None
        for dy in range(3):
            inp = work[ri0 + dy:ri0 + dy + r_out, :, :kin].reshape(
                r_out * WP, kin
            )
            d = jax.lax.dot_general(
                inp, w[dy],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=f32,
                precision=_mxu_precision(inp),
            )
            part = d if part is None else part + d
        part = part.reshape(r_out, WP, 3 * GC)
        acc = jnp.broadcast_to(b_ref[i - 1].astype(f32), (r_out, W, GC))
        for dx in range(3):
            acc = acc + part[:, dx:dx + W, GC * dx:GC * (dx + 1)]
        acc = jnp.where(acc >= 0, acc, slope * acc)
        # zero rows that fall outside the image (the chain's SAME padding
        # means x_i is zero there, not lrelu(bias))
        h0 = i_tile * TH + i - 4  # global h of this conv's first output row
        rr = jax.lax.broadcasted_iota(jnp.int32, (r_out, 1, 1), 0) + h0
        acc = jnp.where((rr >= 0) & (rr < H), acc, 0.0)
        work[ro0:ro1, 1:W + 1, X + GC * (i - 1):X + GC * i] = (
            acc.astype(work.dtype)
        )

    o_ref[0] = work[4:TH + 4, 1:W + 1, X:X + 4 * GC]


def _pallas_impl(x, ws, bs):
    """x: (B,T,H,W,C); ws: 4x (3,3,Cin_i,GC); bs: 4x (GC,).
    Returns the concat (B,T,H,W,4*GC) of the four conv outputs."""
    B, T, H, W, C = x.shape
    TH = _pick_tile_h(H)
    X = _round_up(C, GC)
    WP = _round_up(W + 2, 16)
    BT = B * T

    xp = jnp.pad(
        x.reshape(BT, H, W, C),
        ((0, 0), (4, 4), (1, WP - W - 1), (0, X - C)),
    )
    wps = [_prep_weight(w.astype(x.dtype), C, X) for w in ws]
    bss = jnp.stack([b.astype(jnp.float32) for b in bs])  # (4, GC)

    kernel = partial(
        _chain_kernel, TH=TH, W=W, WP=WP, X=X, H=H, slope=0.2
    )
    out = pl.pallas_call(
        kernel,
        grid=(BT, H // TH),
        out_shape=jax.ShapeDtypeStruct((BT, H, W, 4 * GC), x.dtype),
        in_specs=[
            pl.BlockSpec(
                (pl.Element(1), pl.Element(TH + 8), pl.Element(WP),
                 pl.Element(X)),
                lambda bt, i: (bt, i * TH, 0, 0),
            ),
            *[
                pl.BlockSpec((3, X + GC * k, 3 * GC), lambda bt, i: (0, 0, 0))
                for k in range(4)
            ],
            pl.BlockSpec((4, GC), lambda bt, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, TH, W, 4 * GC), lambda bt, i: (bt, i, 0, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((TH + 8, WP, X + 4 * GC), x.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 2 ** 20,
        ),
        interpret=jax.default_backend() == "cpu",
    )(xp, *wps, bss)
    return out.reshape(B, T, H, W, 4 * GC)


def _xla_impl(x, ws, bs):
    """Reference XLA formulation of the same spatial chain (shift-mode
    convs); used by the custom VJP backward and as the numerical oracle."""
    from .conv import conv3x3_shift, leaky_relu

    feats = x
    outs = []
    for w, b in zip(ws, bs):
        y = leaky_relu(
            conv3x3_shift(feats, w.astype(x.dtype), b.astype(x.dtype))
        )
        outs.append(y)
        feats = jnp.concatenate([feats, y], axis=-1)
    return jnp.concatenate(outs, axis=-1)


@jax.custom_vjp
def fused_dense_spatial(x, ws, bs):
    return _pallas_impl(x, ws, bs)


def _fds_fwd(x, ws, bs):
    return _pallas_impl(x, ws, bs), (x, ws, bs)


def _fds_bwd(res, g):
    x, ws, bs = res
    if chain_bwd_enabled() and chain_bwd_ok(*x.shape[-3:]):
        return _pallas_bwd(x, ws, bs, g)
    _, vjp = jax.vjp(_xla_impl, x, ws, bs)
    return vjp(g)


fused_dense_spatial.defvjp(_fds_fwd, _fds_bwd)


# ===========================================================================
# v2: whole-chain kernel — v1's dy-dot scheme + fused temporal conv5
# ===========================================================================
#
# Same spatial-conv scheme as the v1 kernel (growing concat in one VMEM
# work buffer, 3 dy-accumulated MXU dots per conv, dx-packed 96-lane
# outputs), plus: THE TEMPORAL conv5 FUSES IN-KERNEL via a rotating 3-slot
# VMEM buffer. Grid is (B, row_tiles, T+1) with t innermost; each step
# deposits its (x, x1..x4) inner rows into slot t%3 and emits out(t-1) as
# one dot over all three slots with a phase-permuted weight. The
# (B,T,H,W,4*GC) intermediate and its temporal-pad copies never touch HBM
# (~135 MB of traffic per chain at the flagship shape).
#
# (A dy-packed-contraction variant was measured SLOWER on v5e — the three
# row-shifted subgroup writes per conv cost more than the dot savings —
# so the dot scheme stays v1's.)


def chain_v2_enabled() -> bool:
    """Whole-chain (conv5-fused) kernel gate; SELFC_TPU_PALLAS_V2=0
    disables, =1 forces (interpret mode off-TPU)."""
    flag = os.environ.get("SELFC_TPU_PALLAS_V2", "")
    if flag == "0":
        return False
    if flag == "1":
        return True
    return chain_fused_enabled()


def _pick_tile_h_v2(H: int, lanes: int, c_out: int = 48, W: int = 192,
                    itemsize: int = 2) -> int | None:
    # Preference measured on v5e at the flagship shapes (tools/bench_tiles):
    # 36-row tiles win for the 3->48 chains and wide-output 64-ch chains;
    # 24 wins for the narrow-output (c_out<=8) F chain whose conv5 slot dot
    # is tiny. Larger tiles amortize the 8-row halo recompute.
    #
    # The VMEM model counts EVERYTHING Mosaic allocates per grid step —
    # the double-buffered pipeline windows (whose last dims lane-pad to
    # 128) as well as the kernel scratch — at the ACTUAL width and dtype.
    # The round-4 model assumed W=192/bf16 and skipped the windows, which
    # overcommitted 5x at the codec eval's f32 W=480 tiles (first driven
    # for real by the round-5 x265 RD sweep) and crashed the compile.
    if lanes <= 160:  # X = 32
        order = (36, 24, 16, 12, 8, 6, 4)
    elif c_out <= 8:
        order = (24, 36, 16, 12, 8, 6, 4)
    else:
        order = (36, 24, 16, 12, 8, 6, 4)
    forced = os.environ.get("SELFC_TPU_TILE_H", "")
    if forced:
        order = (int(forced),)
    lane = lambda c: max(_round_up(c, 128), 128)  # noqa: E731
    for th in order:
        if H % th != 0:
            continue
        work = (th + 8) * W * lanes * itemsize
        slot = 3 * th * W * lanes * itemsize
        part = (th + 6) * W * 128 * 4
        xwin = 2 * (th + 8) * W * lane(lanes - 4 * GC) * itemsize
        owin = 2 * th * W * lane(c_out) * itemsize
        feats = 2 * th * W * lane(4 * GC) * itemsize   # emit_feats output
        aux = 2 * 2 * th * W * lane(c_out) * itemsize  # up to 2 ep aux ins
        if work + slot + part + xwin + owin + feats + aux < 64 * 2 ** 20:
            return th
    return None


def chain_v2_shapes_ok(T: int, H: int, W: int, C: int, c_out: int) -> bool:
    X = _round_up(C, GC)
    # itemsize 4: the gate must accept only what the f32 eval path can
    # also compile (the impl re-picks with the actual dtype, >= this tile)
    th = _pick_tile_h_v2(H, X + 4 * GC, c_out, _round_up(W, 16), 4)
    # any W: the wrapper pads to a 16-column multiple and the kernel keeps
    # the pad columns zeroed. Only bail when padding would outweigh the
    # kernel's ~2.4x advantage over the XLA chain (pad ratio > 2).
    return th is not None and 2 * W >= _round_up(W, 16)


def _prep_w5_v2(w5, C: int, X: int, c_out: int):
    """(3dt, C+4*GC, Cout) -> (3 phases, 3*(X+4*GC), Cout).

    Slot s at phase p (p = t % 3) holds f(t - ((p - s) % 3)); the conv5 tap
    for out(t-1) reading f(t-k) is w5[2-k]. Zero rows pad channels C..X."""
    Xp = X + 4 * GC
    rows = []
    z = jnp.zeros((X - C, c_out), w5.dtype)
    for p in range(3):
        phase_rows = []
        for s in range(3):
            k = (p - s) % 3  # slot s holds f(t-k)
            tap = w5[2 - k]  # (C+4GC, Cout)
            seg = jnp.concatenate([tap[:C], z, tap[C:]], axis=0)  # (Xp, Cout)
            phase_rows.append(seg)
        rows.append(jnp.concatenate(phase_rows, axis=0))  # (3*Xp, Cout)
    return jnp.stack(rows)  # (3, 3*Xp, Cout)


# Coupling epilogues fused onto conv5's fp32 accumulator. These absorb the
# InvBlockExp glue arithmetic (reference SelfC_GMM_arch_inv.py:18-34) into
# the chain kernel so s/exp(s) and the y1/y2 combines never round-trip HBM:
#   add       y = a + y5              (fwd y1 = x1 + F(x2))
#   sub_from  y = a - y5              (rev y1 = x1 - F(y2))
#   sig_exp   y = exp(+c*(2sig-1))    (fwd scale exp(s) from H)
#   sig_exp_neg y = exp(-c*(2sig-1))  (rev scale exp(-s) from H)
#   mul_add   y = a*m + y5            (fwd y2 = x2*exp(s) + G(y1))
#   sub_mul   y = (a - y5)*m          (rev y2 = (x2 - G(x1))*exp(-s))
EP_AUX = {"none": 0, "sig_exp": 0, "sig_exp_neg": 0, "add": 1,
          "sub_from": 1, "mul_add": 2, "sub_mul": 2}


def ep_apply(y, mode, clamp, a=None, m=None):
    if mode == "none":
        return y
    if mode == "add":
        return a + y
    if mode == "sub_from":
        return a - y
    if mode == "sig_exp":
        return jnp.exp(clamp * (2.0 * jax.nn.sigmoid(y) - 1.0))
    if mode == "sig_exp_neg":
        return jnp.exp(-clamp * (2.0 * jax.nn.sigmoid(y) - 1.0))
    if mode == "mul_add":
        return a * m + y
    if mode == "sub_mul":
        return (a - y) * m
    raise ValueError(mode)


def _chain_kernel_v2(x_ref, w1, w2, w3, w4, b_ref, w5_ref, b5_ref, *rest,
                     TH, W, WT=None, X, H, T, slope, ep="none", clamp=1.0,
                     emit_feats=False, WS=None):
    n_aux = EP_AUX[ep]
    aux = rest[:n_aux]
    if emit_feats:
        o_ref, f_ref = rest[n_aux], rest[n_aux + 1]
        work, slots = rest[n_aux + 2], rest[n_aux + 3]
    else:
        o_ref, f_ref = rest[n_aux], None
        work, slots = rest[n_aux + 1], rest[n_aux + 2]
    _chain_kernel_v2_body(
        x_ref, w1, w2, w3, w4, b_ref, w5_ref, b5_ref, aux, o_ref,
        work, slots, TH=TH, W=W, WT=W if WT is None else WT, X=X, H=H, T=T,
        slope=slope, ep=ep, clamp=clamp, f_ref=f_ref, WS=WS,
    )


def _spatial_chain_into(x_block, w_refs, b_ref, work, *, i_tile, TH, W, WT,
                        X, H, slope, WS=None):
    """Fill `work` with [x | x1..x4] for one (frame, row-tile) window.

    Column handling: the work buffer is exactly W wide (W % 16 == 0 by
    the shape gate) — the dx taps at the image edges are resolved by
    CLIPPED adds in the assembly below instead of zero-padded columns.
    That removes the old round-up-to-192 column pad from every MXU dot
    (~8% of dot rows at the flagship W=176).

    ``WS`` (stripe width) supports batch-packing along W: the buffer may
    hold P independent images side by side in WS-column stripes; the
    dx-tap edge masks then fire at every stripe boundary (ww % WS), so
    each stripe behaves exactly like a separate SAME-padded image."""
    f32 = jnp.float32
    if WS is None:
        WS = W
    work[:, :, :X] = x_block
    for i in range(1, 5):
        kin = X + GC * (i - 1)
        ri0 = i - 1
        ro0, ro1 = i, TH + 8 - i
        r_out = ro1 - ro0
        w = w_refs[i - 1]
        part = None
        for dy in range(3):
            inp = work[ri0 + dy:ri0 + dy + r_out, :, :kin].reshape(
                r_out * W, kin
            )
            d = jax.lax.dot_general(
                inp, w[dy],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=f32,
                precision=_mxu_precision(inp),
            )
            part = d if part is None else part + d
        part = part.reshape(r_out, W, 3 * GC)
        # acc[:, w] = sum_dx part[:, w + dx - 1, seg dx]; edge taps fall
        # on zero padding in the old scheme -> rolled + masked here
        # (tpu.rotate on the sublane dim; the wrapped column is zeroed)
        ww = jax.lax.broadcasted_iota(jnp.int32, (r_out, W, 1), 1)
        ws_col = ww % WS if WS < W else ww
        a0 = pltpu.roll(part[:, :, 0:GC], 1, 1)
        a0 = jnp.where(ws_col >= 1, a0, 0.0)
        a2 = pltpu.roll(part[:, :, 2 * GC:3 * GC], W - 1, 1)
        a2 = jnp.where(ws_col <= WS - 2, a2, 0.0)
        a1 = part[:, :, GC:2 * GC]
        ep_in_dt = ep_in_input_dtype() and work.dtype != f32
        if ep_in_dt:
            # round the per-dx fp32 partials once to the input dtype; the
            # remaining adds + bias + LeakyReLU + row-mask then run at
            # half the VPU/VMEM traffic (bf16). Rolls/edge-masks stay fp32
            # (Mosaic has no bf16 sublane rotate).
            a0, a1, a2 = (v.astype(work.dtype) for v in (a0, a1, a2))
        acc = a0 + a1 + a2
        acc = acc + b_ref[i - 1].astype(acc.dtype)
        h0 = i_tile * TH + i - 4
        rr = jax.lax.broadcasted_iota(jnp.int32, (r_out, 1, 1), 0) + h0
        ok = (rr >= 0) & (rr < H)
        if WT < W:
            # pad columns must stay zero (bias+lrelu made them
            # nonzero) so the next conv's dx=+1 tap at col WT-1
            # reads true zeros ('same' zero-pad semantics)
            ok = ok & (ww < WT)
        if ep_in_dt:
            # the VPU has no bf16 compare/select: LeakyReLU as max(x, s*x)
            # (identical for s < 1) and the row-mask as a multiply
            acc = jnp.maximum(acc, slope * acc)
            acc = acc * ok.astype(acc.dtype)
        else:
            acc = jnp.where(acc >= 0, acc, slope * acc)
            acc = jnp.where(ok, acc, 0.0)
        work[ro0:ro1, :, X + GC * (i - 1):X + GC * i] = (
            acc.astype(work.dtype)
        )


def _deposit_slot(slots, work, t, TH, Xp):
    """Deposit this frame's inner rows (one contiguous copy: the work
    buffer is already [x | x1..x4]) into slot t%3."""
    for s in range(3):
        @pl.when(t % 3 == s)
        def _deposit(s=s):
            slots[:, :, s * Xp:(s + 1) * Xp] = work[4:TH + 4]


def _zero_slot(slots, t, TH, W, Xp):
    """f(T) does not exist; its slot must read as zero for out(T-1)."""
    for s in range(3):
        @pl.when(t % 3 == s)
        def _z(s=s):
            slots[:, :, s * Xp:(s + 1) * Xp] = jnp.zeros(
                (TH, W, Xp), slots.dtype
            )


def _conv5_phase_dot(slots, w5_ref, b5_ref, phase, TH, W):
    """out(t-1): one dot over all three slots with the phase-selected
    weight. Returns the fp32 (TH, W, c_out) accumulator + bias."""
    f32 = jnp.float32
    inp5 = slots[...].reshape(TH * W, -1)
    w5p = w5_ref[pl.ds(phase, 1)][0]
    y5 = jax.lax.dot_general(
        inp5, w5p,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=f32,
        precision=_mxu_precision(inp5),
    ).reshape(TH, W, -1)
    return y5 + b5_ref[0].astype(f32)


def _chain_kernel_v2_body(x_ref, w1, w2, w3, w4, b_ref, w5_ref, b5_ref, aux,
                          o_ref, work, slots, *, TH, W, WT, X, H, T, slope,
                          ep, clamp, f_ref=None, WS=None):
    i_tile = pl.program_id(1)
    t = pl.program_id(2)
    f32 = jnp.float32
    Xp = X + 4 * GC

    @pl.when(t == 0)
    def _zero_slots():
        slots[...] = jnp.zeros_like(slots)

    @pl.when(t < T)
    def _compute():
        _spatial_chain_into(
            x_ref[0, 0], (w1, w2, w3, w4), b_ref, work,
            i_tile=i_tile, TH=TH, W=W, WT=WT, X=X, H=H, slope=slope, WS=WS,
        )
        _deposit_slot(slots, work, t, TH, Xp)
        if f_ref is not None:
            # save the spatial-chain features for the fused backward: the
            # adjoint sweep then loads `work` instead of recomputing it
            # (12 of its 36 MXU dots per chain)
            f_ref[0, 0] = work[4:TH + 4, :, X:]

    @pl.when(t == T)
    def _zero_future_slot():
        _zero_slot(slots, t, TH, W, Xp)

    # t==0 is the warm-up step (out(-1) does not exist): the out spec maps
    # t=0 and t=1 to the SAME block, which only flushes when its index
    # changes at t=2, so the whole emit is skipped — saving one conv5 dot
    # per (batch, row-tile).
    @pl.when(t > 0)
    def _emit():
        y5 = _conv5_phase_dot(slots, w5_ref, b5_ref, t % 3, TH, W)
        if ep != "none":
            aa = aux[0][0, 0].astype(f32) if len(aux) >= 1 else None
            mm = aux[1][0, 0].astype(f32) if len(aux) >= 2 else None
            y5 = ep_apply(y5, ep, clamp, aa, mm)
        o_ref[0, 0] = y5.astype(o_ref.dtype)


def _pallas_impl_v2(x, ws, bs, w5, b5, ep="none", clamp=1.0, a=None, m=None,
                    emit_feats=False, stripe_w=None):
    """x: (B,T,H,W,C); ws: 4 conv weights; w5: (3, C+4*GC, Cout).
    Returns ep_apply(conv5(concat(x, x1..x4)), a, m): (B,T,H,W,Cout).
    With ``emit_feats`` also returns the spatial-chain features
    (B,T,H,Wp,4*GC) at the kernel's PADDED width (consumed verbatim by
    ``_pallas_bwd``'s saved-feats path)."""
    B, T, H, W, C = x.shape
    # width to a 16-column multiple (bf16 sublane tile): pad columns carry
    # zeros through the whole chain (the kernel re-zeroes them after each
    # bias+lrelu), which IS the 'same' zero-pad conv semantics, then the
    # output is sliced back. Train-config latents (e.g. 36x36) hit this.
    WT = W
    Wp = _round_up(W, 16)
    if Wp != W:
        wpad = ((0, 0), (0, 0), (0, 0), (0, Wp - W), (0, 0))
        x = jnp.pad(x, wpad)
        a = jnp.pad(a, wpad) if a is not None else None
        m = jnp.pad(m, wpad) if m is not None else None
        W = Wp
    X = _round_up(C, GC)
    c_out = w5.shape[-1]
    TH = _pick_tile_h_v2(H, X + 4 * GC, c_out, W, x.dtype.itemsize)

    xp = jnp.pad(x, ((0, 0), (0, 0), (4, 4), (0, 0), (0, X - C)))
    wps = [_prep_weight(w.astype(x.dtype), C, X) for w in ws]
    bss = jnp.stack([b.astype(jnp.float32) for b in bs])  # (4, GC)
    w5p = _prep_w5_v2(w5.astype(x.dtype), C, X, c_out)
    b5p = b5.astype(jnp.float32).reshape(1, -1)

    kernel = partial(
        _chain_kernel_v2, TH=TH, W=W, WT=WT, X=X, H=H, T=T, slope=0.2,
        ep=ep, clamp=clamp, emit_feats=emit_feats, WS=stripe_w,
    )
    aux_arrays = [v for v in (a, m)[:EP_AUX[ep]]]
    aux_specs = [
        pl.BlockSpec(
            (1, 1, TH, W, c_out),
            lambda b, i, t: (b, jnp.maximum(t - 1, 0), i, 0, 0),
        )
        for _ in aux_arrays
    ]
    out_shape = jax.ShapeDtypeStruct((B, T, H, W, c_out), x.dtype)
    out_spec = pl.BlockSpec(
        (1, 1, TH, W, c_out),
        lambda b, i, t: (b, jnp.maximum(t - 1, 0), i, 0, 0),
    )
    if emit_feats:
        out_shape = [out_shape,
                     jax.ShapeDtypeStruct((B, T, H, W, 4 * GC), x.dtype)]
        out_spec = [out_spec, pl.BlockSpec(
            (1, 1, TH, W, 4 * GC),
            lambda b, i, t: (b, jnp.minimum(t, T - 1), i, 0, 0),
        )]
    out = pl.pallas_call(
        kernel,
        grid=(B, H // TH, T + 1),
        out_shape=out_shape,
        in_specs=[
            pl.BlockSpec(
                (pl.Element(1), pl.Element(1), pl.Element(TH + 8),
                 pl.Element(W), pl.Element(X)),
                lambda b, i, t: (b, jnp.minimum(t, T - 1), i * TH, 0, 0),
            ),
            *[
                pl.BlockSpec((3, X + GC * k, 3 * GC),
                             lambda b, i, t: (0, 0, 0))
                for k in range(4)
            ],
            pl.BlockSpec((4, GC), lambda b, i, t: (0, 0)),
            pl.BlockSpec((3, 3 * (X + 4 * GC), c_out),
                         lambda b, i, t: (0, 0, 0)),
            pl.BlockSpec((1, c_out), lambda b, i, t: (0, 0)),
            *aux_specs,
        ],
        out_specs=out_spec,
        scratch_shapes=[
            pltpu.VMEM((TH + 8, W, X + 4 * GC), x.dtype),
            pltpu.VMEM((TH, W, 3 * (X + 4 * GC)), x.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2 ** 20,
        ),
        interpret=jax.default_backend() == "cpu",
    )(xp, *wps, bss, w5p, b5p, *[v.astype(x.dtype) for v in aux_arrays])
    if emit_feats:
        out, feats = out
        if WT != W:
            out = out[:, :, :, :WT, :]
        return out, feats  # feats stay at the padded width Wp
    if WT != W:
        out = out[:, :, :, :WT, :]
    return out


# ===========================================================================
# v3: v2 + dy-packed contractions for the low-K convs
# ===========================================================================
#
# v2 runs every spatial conv as 3 dy-accumulated dots. At the chain's small
# contraction sizes that wastes MXU passes: conv1 (K=X<=64) occupies a
# fraction of the 128 sublanes three times over. v3 keeps a SECOND work
# buffer whose lanes hold dy-triplets of the early features
# ([x@-1 | x@0 | x@+1 | x1@-1 | ...]) so conv_i (i <= pack depth P) runs as
# ONE dot with K = 3*K_i. Packing is applied exactly where it reduces MXU
# passes (ceil arithmetic below): P=2 for X=32 chains (passes 12 -> 9),
# P=4 for X=64 (15 -> 12). The triplet buffer costs three row-shifted
# writes per packed feature — cheap VPU copies vs the saved passes.


def chain_v3_enabled() -> bool:
    """dy-packed kernel gate — DEFAULT OFF: measured on v5e, the dy-triplet
    buffer's row-shifted writes cost more than the saved MXU passes
    (0.72-0.91x vs v2 at matched tile size; see docs/PERF.md). Kept as an
    opt-in experiment: SELFC_TPU_PALLAS_V3=1 enables."""
    return os.environ.get("SELFC_TPU_PALLAS_V3", "") == "1"


def _passes(k: int) -> int:
    return -(-k // 128)


def _pick_pack_depth(X: int) -> int:
    """Deepest conv i whose dy-packed dot takes fewer MXU passes than three
    dy dots; convs above it read the plain (work_s) buffer."""
    P = 0
    for i in range(1, 5):
        k = X + GC * (i - 1)
        if _passes(3 * k) < 3 * _passes(k):
            P = i
    return P


def _pick_tile_h_v3(H: int, X: int, P: int) -> int | None:
    lanes_s = X + 4 * GC
    lanes_p = 3 * (X + GC * (P - 1)) if P else 0
    order = (48, 36, 24, 16, 12, 8, 6, 4)
    forced = os.environ.get("SELFC_TPU_TILE_H", "")
    if forced:
        order = (int(forced),)
    for th in order:
        if H % th != 0:
            continue
        work_s = (th + 8) * 192 * lanes_s * 2
        work_p = (th + 8) * 192 * lanes_p * 2
        slot = 3 * th * 192 * lanes_s * 2
        part = (th + 6) * 192 * 128 * 4
        if work_s + work_p + slot + part < 48 * 2 ** 20:
            return th
    return None


def chain_v3_shapes_ok(T: int, H: int, W: int, C: int, c_out: int) -> bool:
    X = _round_up(C, GC)
    th = _pick_tile_h_v3(H, X, _pick_pack_depth(X))
    return th is not None and W % 16 == 0


def _prep_weight_packed(w, C: int, X: int):
    """(3, 3, Cin, GC) -> (3*X + 3*(Cin-C), 3*GC): rows ordered
    feature-major then dy ([x@dy0 | x@dy1 | x@dy2 | x1@dy0 | ...]) to match
    the v3 triplet work buffer's lane layout."""
    wt = _prep_weight(w, C, X)  # (3, X + (Cin - C), 3*GC)
    Xin = wt.shape[1]
    bounds = [0, X] + [X + GC * j for j in range(1, (Xin - X) // GC + 1)]
    segs = []
    for f in range(len(bounds) - 1):
        for dy in range(3):
            segs.append(wt[dy, bounds[f]:bounds[f + 1]])
    return jnp.concatenate(segs, axis=0)  # (3*Xin, 3*GC)


def _chain_kernel_v3(x_ref, w1, w2, w3, w4, b_ref, w5_ref, b5_ref, o_ref,
                     work, work_p, slots, *, TH, W, WP, X, H, T, P, slope):
    i_tile = pl.program_id(1)
    t = pl.program_id(2)
    f32 = jnp.float32
    Xp = X + 4 * GC
    w_refs = (w1, w2, w3, w4)

    @pl.when(t == 0)
    def _zero_slots():
        slots[...] = jnp.zeros_like(slots)

    @pl.when(t < T)
    def _compute():
        # plain (shift-0) buffer: x at lanes [0, X) — x_ref rows are padded
        # by 5 so its shift-0 window is rows [1, TH+9)
        work[:, :, :X] = x_ref[0, 0, 1:TH + 9]
        work[:, 0:1, X:] = jnp.zeros((TH + 8, 1, 4 * GC), work.dtype)
        work[:, W + 1:WP, X:] = jnp.zeros((TH + 8, WP - W - 1, 4 * GC),
                                          work.dtype)
        if P:
            # dy-triplet buffer: segment s of feature f at row r holds
            # f[r + s - 1]; x segments fill straight from the padded window
            for s in range(3):
                work_p[:, :, s * X:(s + 1) * X] = x_ref[0, 0, s:TH + 8 + s]
            if P > 1:
                work_p[:, 0:1, 3 * X:] = jnp.zeros(
                    (TH + 8, 1, 3 * GC * (P - 1)), work_p.dtype
                )
                work_p[:, W + 1:WP, 3 * X:] = jnp.zeros(
                    (TH + 8, WP - W - 1, 3 * GC * (P - 1)), work_p.dtype
                )
        for i in range(1, 5):
            kin = X + GC * (i - 1)
            ri0 = i - 1
            ro0, ro1 = i, TH + 8 - i
            r_out = ro1 - ro0
            if i <= P:
                # one packed dot: K = 3*kin over the triplet lanes
                inp = work_p[ri0 + 1:ri0 + 1 + r_out, :, :3 * kin].reshape(
                    r_out * WP, 3 * kin
                )
                part = jax.lax.dot_general(
                    inp, w_refs[i - 1][...],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=f32,
                    precision=_mxu_precision(inp),
                )
            else:
                w = w_refs[i - 1]
                part = None
                for dy in range(3):
                    inp = work[ri0 + dy:ri0 + dy + r_out, :, :kin].reshape(
                        r_out * WP, kin
                    )
                    d = jax.lax.dot_general(
                        inp, w[dy],
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=f32,
                        precision=_mxu_precision(inp),
                    )
                    part = d if part is None else part + d
            part = part.reshape(r_out, WP, 3 * GC)
            acc = jnp.broadcast_to(b_ref[i - 1].astype(f32), (r_out, W, GC))
            for dx in range(3):
                acc = acc + part[:, dx:dx + W, GC * dx:GC * (dx + 1)]
            acc = jnp.where(acc >= 0, acc, slope * acc)
            h0 = i_tile * TH + i - 4
            rr = jax.lax.broadcasted_iota(jnp.int32, (r_out, 1, 1), 0) + h0
            acc = jnp.where((rr >= 0) & (rr < H), acc, 0.0)
            accw = acc.astype(work.dtype)
            work[ro0:ro1, 1:W + 1, X + GC * (i - 1):X + GC * i] = accw
            if i < P:
                # feed the triplet buffer: segment s rows r = x_i[r + s - 1]
                base = 3 * X + 3 * GC * (i - 1)
                for s in range(3):
                    lo = ro0 - s + 1
                    hi = ro1 - s + 1
                    a0, a1 = 0, r_out
                    if lo < 0:
                        a0, lo = -lo, 0
                    if hi > TH + 8:
                        a1, hi = a1 - (hi - (TH + 8)), TH + 8
                    work_p[lo:hi, 1:W + 1, base + GC * s:base + GC * (s + 1)] = (
                        accw[a0:a1]
                    )
        for s in range(3):
            @pl.when(t % 3 == s)
            def _deposit(s=s):
                slots[:, :, s * Xp:(s + 1) * Xp] = work[4:TH + 4]

    @pl.when(t == T)
    def _zero_future_slot():
        for s in range(3):
            @pl.when(t % 3 == s)
            def _z(s=s):
                slots[:, :, s * Xp:(s + 1) * Xp] = jnp.zeros(
                    (TH, WP, Xp), slots.dtype
                )

    phase = t % 3
    inp5 = slots[...].reshape(TH * WP, 3 * Xp)
    w5p = w5_ref[pl.ds(phase, 1)][0]
    y5 = jax.lax.dot_general(
        inp5, w5p,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=f32,
        precision=_mxu_precision(inp5),
    ).reshape(TH, WP, -1)
    y5 = y5 + b5_ref[0].astype(f32)
    o_ref[0, 0] = y5[:, 1:W + 1].astype(o_ref.dtype)


def _pallas_impl_v3(x, ws, bs, w5, b5):
    """v2 semantics, dy-packed low-K convs. Same signature/result as v2."""
    B, T, H, W, C = x.shape
    X = _round_up(C, GC)
    P = _pick_pack_depth(X)
    c_out = w5.shape[-1]
    TH = _pick_tile_h_v3(H, X, P)
    WP = _round_up(W + 2, 16)

    xp = jnp.pad(x, ((0, 0), (0, 0), (5, 5), (1, WP - W - 1), (0, X - C)))
    wps = [
        _prep_weight_packed(w.astype(x.dtype), C, X) if i < P
        else _prep_weight(w.astype(x.dtype), C, X)
        for i, w in enumerate(ws)
    ]
    bss = jnp.stack([b.astype(jnp.float32) for b in bs])  # (4, GC)
    w5p = _prep_w5_v2(w5.astype(x.dtype), C, X, c_out)
    b5p = b5.astype(jnp.float32).reshape(1, -1)

    kernel = partial(
        _chain_kernel_v3, TH=TH, W=W, WP=WP, X=X, H=H, T=T, P=P, slope=0.2
    )
    in_specs = [
        pl.BlockSpec(
            (pl.Element(1), pl.Element(1), pl.Element(TH + 10),
             pl.Element(WP), pl.Element(X)),
            lambda b, i, t: (b, jnp.minimum(t, T - 1), i * TH, 0, 0),
        ),
    ]
    for k in range(4):
        if k < P:
            in_specs.append(
                pl.BlockSpec((3 * (X + GC * k), 3 * GC),
                             lambda b, i, t: (0, 0))
            )
        else:
            in_specs.append(
                pl.BlockSpec((3, X + GC * k, 3 * GC),
                             lambda b, i, t: (0, 0, 0))
            )
    in_specs += [
        pl.BlockSpec((4, GC), lambda b, i, t: (0, 0)),
        pl.BlockSpec((3, 3 * (X + 4 * GC), c_out),
                     lambda b, i, t: (0, 0, 0)),
        pl.BlockSpec((1, c_out), lambda b, i, t: (0, 0)),
    ]
    lanes_p = 3 * (X + GC * (P - 1)) if P else 3 * X
    out = pl.pallas_call(
        kernel,
        grid=(B, H // TH, T + 1),
        out_shape=jax.ShapeDtypeStruct((B, T, H, W, c_out), x.dtype),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, 1, TH, W, c_out),
            lambda b, i, t: (b, jnp.maximum(t - 1, 0), i, 0, 0),
        ),
        scratch_shapes=[
            pltpu.VMEM((TH + 8, WP, X + 4 * GC), x.dtype),
            pltpu.VMEM((TH + 8, WP, lanes_p), x.dtype),
            pltpu.VMEM((TH, WP, 3 * (X + 4 * GC)), x.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2 ** 20,
        ),
        interpret=jax.default_backend() == "cpu",
    )(xp, *wps, bss, w5p, b5p)
    return out


def _impl_best(x, ws, bs, w5, b5):
    B, T, H, W, C = x.shape
    if chain_v3_enabled() and chain_v3_shapes_ok(T, H, W, C, w5.shape[-1]):
        return _pallas_impl_v3(x, ws, bs, w5, b5)
    if ride_ok(w5.shape[-1], W):
        return _pallas_impl_v2r(x, ws, bs, w5, b5)
    P = _pick_pack_w(B, W) if pack_w_enabled() else 1
    if P > 1:
        return _unpack_w(
            _pallas_impl_v2(_pack_w(x, P), ws, bs, w5, b5, stripe_w=W), P
        )
    return _pallas_impl_v2(x, ws, bs, w5, b5)


def _xla_impl_v2(x, ws, bs, w5, b5):
    """XLA oracle/backward for the full chain incl. temporal conv5."""
    from .conv import temporal_conv3

    feats = _xla_impl(x, ws, bs)
    C = x.shape[-1]
    return (temporal_conv3(x, w5[:, :C].astype(x.dtype), None)
            + temporal_conv3(feats, w5[:, C:].astype(x.dtype),
                             b5.astype(x.dtype)))


def pack_w_enabled() -> bool:
    """Batch-packing along W for small-W (training) latents; the kernel's
    stripe masks keep each packed image independent. =0 disables."""
    return os.environ.get("SELFC_TPU_PALLAS_PACK_W", "") != "0"


def _pick_pack_w(B: int, W: int) -> int:
    """Images laid side by side per kernel row. A 36-col train latent pads
    to 48 (25% dead columns in every MXU dot M-dim) and runs B*T tiny grid
    steps; packing 4 images makes W=144 (no pad), 4x fewer grid steps, and
    bigger dots — measured 1.6x per-pixel on v5e. Only exact 16-multiples
    qualify so the stripe masks never interact with pad-column masks."""
    if W % 16 == 0 and W >= 96:
        return 1
    for P in (8, 4, 2):
        if B % P == 0 and P * W <= 192 and P * W >= 64 and (P * W) % 16 == 0:
            return P
    return 1


def _pack_w(x, P):
    """(B,T,H,W,C) -> (B/P,T,H,P*W,C): batch entry b*P+p becomes stripe p."""
    B, T, H, W, C = x.shape
    return (x.reshape(B // P, P, T, H, W, C)
            .transpose(0, 2, 3, 1, 4, 5)
            .reshape(B // P, T, H, P * W, C))


def _unpack_w(y, P):
    Bp, T, H, PW, C = y.shape
    W = PW // P
    return (y.reshape(Bp, T, H, P, W, C)
            .transpose(0, 3, 1, 2, 4, 5)
            .reshape(Bp * P, T, H, W, C))


@jax.custom_vjp
def _fused_dense_chain_t_cv(x, ws, bs, w5, b5):
    return _impl_best(x, ws, bs, w5, b5)


def pad_gc_params(ws, bs, w5):
    """Zero-pad a gc<32 chain's params to the kernel's 32-lane growth
    segments (the codec STP runs gc=12, reference
    SelfC_Codec_arch_inv.py:253 stp_denseblock_innerc).

    K and N round to the MXU's 128 granularity anyway, so the padded dots
    take the same number of passes as true-gc dots would — the pad lanes
    carry exact zeros (zero weights + zero bias -> lrelu 0) and contribute
    nothing. Happens OUTSIDE the custom_vjp, so weight cotangents flow
    back through the pad's slice adjoint automatically."""
    gc = ws[0].shape[-1]
    if gc == GC:
        return ws, bs, w5
    C = ws[0].shape[2]
    pws = []
    for i, w in enumerate(ws):
        segs = [w[:, :, :C]]
        for j in range(i):
            s = w[:, :, C + j * gc:C + (j + 1) * gc]
            segs.append(jnp.pad(s, ((0, 0), (0, 0), (0, GC - gc), (0, 0))))
        wp = jnp.concatenate(segs, axis=2) if i else segs[0]
        pws.append(jnp.pad(wp, ((0, 0), (0, 0), (0, 0), (0, GC - gc))))
    pbs = tuple(jnp.pad(b, (0, GC - gc)) for b in bs)
    segs5 = [w5[:, :C]]
    for j in range(4):
        s = w5[:, C + j * gc:C + (j + 1) * gc]
        segs5.append(jnp.pad(s, ((0, 0), (0, GC - gc), (0, 0))))
    return tuple(pws), pbs, jnp.concatenate(segs5, axis=1)


def fused_dense_chain_t(x, ws, bs, w5, b5):
    """Public whole-chain call; casts params to the activation dtype BEFORE
    the custom_vjp so the Pallas forward and the XLA backward oracle agree
    on every dtype (mixed-precision training feeds bf16 activations with
    fp32 master params — the outer astype converts the bf16 cotangent back
    to fp32 for Adam). gc<32 chains are zero-padded to the kernel's
    32-lane growth (pad_gc_params)."""
    dt = x.dtype
    ws, bs, w5 = pad_gc_params(ws, bs, w5)
    return _fused_dense_chain_t_cv(
        x, tuple(w.astype(dt) for w in ws), tuple(b.astype(dt) for b in bs),
        w5.astype(dt), b5.astype(dt),
    )


def save_feats_enabled() -> bool:
    """Save the spatial-chain features from the forward kernel for the
    fused adjoint (skips the backward's fwd recompute: 36 -> 24 MXU dots
    per chain). Costs one extra (B,T,H,W,4*GC) bf16 HBM array per chain
    over the backward's lifetime. SELFC_TPU_PALLAS_SAVE_FEATS=0 disables
    (the adjoint then recomputes in-kernel as before)."""
    flag = os.environ.get("SELFC_TPU_PALLAS_SAVE_FEATS", "")
    if flag == "0":
        return False
    if flag == "1":
        return True
    return chain_fused_enabled()


def _save_feats_active(x, w5) -> bool:
    if not save_feats_enabled() or chain_v3_enabled():
        return False
    T, H, W, C = x.shape[1:]
    return (
        chain_bwd_enabled()
        and chain_bwd_ok(H, W, C)
        and chain_v2_shapes_ok(T, H, W, C, w5.shape[-1])
    )


def _fdc_fwd(x, ws, bs, w5, b5):
    if _save_feats_active(x, w5):
        P = (_pick_pack_w(x.shape[0], x.shape[3])
             if pack_w_enabled() else 1)
        if P > 1:
            y, feats = _pallas_impl_v2(
                _pack_w(x, P), ws, bs, w5, b5, emit_feats=True,
                stripe_w=x.shape[3],
            )
            return _unpack_w(y, P), (x, ws, bs, w5, b5, feats)
        y, feats = _pallas_impl_v2(x, ws, bs, w5, b5, emit_feats=True)
        return y, (x, ws, bs, w5, b5, feats)
    return _impl_best(x, ws, bs, w5, b5), (x, ws, bs, w5, b5, None)


def _conv5_head(x, feats, w5, b5):
    """The whole-chain call minus the spatial chain: temporal conv5 over
    (x, feats) without materializing their concat. Matmul-shaped — its
    adjoint stays in XLA (see the backward section)."""
    from .conv import temporal_conv3

    C = x.shape[-1]
    return (temporal_conv3(x, w5[:, :C].astype(x.dtype), None)
            + temporal_conv3(feats, w5[:, C:].astype(x.dtype),
                             b5.astype(x.dtype)))


def _fdc_bwd(res, g):
    x, ws, bs, w5, b5, feats_p = res
    if chain_bwd_enabled() and chain_bwd_ok(*x.shape[-3:]):
        if feats_p is not None:
            P = x.shape[0] // feats_p.shape[0]
        else:
            P = (_pick_pack_w(x.shape[0], x.shape[3])
                 if pack_w_enabled() else 1)
        WS = x.shape[3]
        xw = _pack_w(x, P) if P > 1 else x
        gw = _pack_w(g, P) if P > 1 else g
        if feats_p is None:
            # no saved features: compute them ONCE (padded) and hand them
            # to the adjoint kernel, which then skips its own recompute
            feats_p = _pallas_feats(xw, ws, bs, keep_pad=True,
                                    stripe_w=WS if P > 1 else None)
        feats = feats_p[..., :xw.shape[-2], :]
        _, vjp5 = jax.vjp(_conv5_head, xw, feats, w5, b5)
        dx_direct, dfeats, dw5, db5 = vjp5(gw)
        dx_chain, dws, dbs = _pallas_bwd(
            xw, ws, bs, dfeats, feats=feats_p,
            stripe_w=WS if P > 1 else None,
        )
        dx = dx_direct + dx_chain
        return (_unpack_w(dx, P) if P > 1 else dx), dws, dbs, dw5, db5
    _, vjp = jax.vjp(_xla_impl_v2, x, ws, bs, w5, b5)
    return vjp(g)


_fused_dense_chain_t_cv.defvjp(_fdc_fwd, _fdc_bwd)


# ===========================================================================
# HG pair: both coupling subnets H and G in ONE kernel launch
# ===========================================================================
#
# In every InvBlockExp the H and G chains read the SAME input (y1 on the
# forward pass, x1 on the reverse — reference SelfC_GMM_arch_inv.py:18-34),
# and their outputs only ever meet in the coupling combine:
#   fwd: y2 = x2 * exp(s) + G(y1),  s = clamp*(2*sigmoid(H(y1)) - 1)
#   rev: y2 = (x2 - G(x1)) * exp(-s)
# This kernel runs both chains in one pallas_call — one grid, one shared
# x window read, two work/slot buffers — and applies the combine on the
# fp32 conv5 accumulators: exp(+-s) never round-trips HBM at all (the
# separate-launch scheme wrote it bf16 and re-read it as the `m` aux).
# Outputs: (y2, exp(+-s)); the caller takes sum(log(.)) of the second for
# the log-jacobian.


def hg_enabled() -> bool:
    """HG pair kernel gate — DEFAULT OFF: measured on v5e at the flagship
    latent shape (7x144x176, bf16), the pair launch is at best a wash vs
    two ep launches (1.60 vs 1.57 ms at its best tile TH=24) and 1.4x
    WORSE at v2's preferred TH=36 — the doubled work+slot VMEM footprint
    degrades the input-window pipelining more than the saved launch and
    the in-VMEM exp(s) hand-off gain. Kept as an opt-in experiment:
    SELFC_TPU_PALLAS_HG=1 enables."""
    return os.environ.get("SELFC_TPU_PALLAS_HG", "") == "1"


def _pick_tile_h_hg(H: int, lanes: int) -> int | None:
    # 24 first: the doubled buffers make v2's 36-row tile ~1.4x slower
    order = (24, 16, 36, 12, 8, 6, 4)
    forced = os.environ.get("SELFC_TPU_TILE_H", "")
    if forced:
        order = (int(forced),)
    for th in order:
        if H % th != 0:
            continue
        work = (th + 8) * 192 * lanes * 2
        slot = 3 * th * 192 * lanes * 2
        part = (th + 6) * 192 * 128 * 4
        if 2 * (work + slot) + part < 90 * 2 ** 20:
            return th
    return None


def hg_shapes_ok(T: int, H: int, W: int, C: int, c_out: int) -> bool:
    X = _round_up(C, GC)
    th = _pick_tile_h_hg(H, X + 4 * GC)
    return th is not None and 2 * W >= _round_up(W, 16)


def _hg_kernel(x_ref, hw1, hw2, hw3, hw4, hb, hw5, hb5,
               gw1, gw2, gw3, gw4, gb, gw5, gb5, x2_ref,
               y2_ref, se_ref, work_h, slots_h, work_g, slots_g, *,
               TH, W, WT, X, H, T, slope, clamp, rev):
    i_tile = pl.program_id(1)
    t = pl.program_id(2)
    f32 = jnp.float32
    Xp = X + 4 * GC

    @pl.when(t == 0)
    def _zero_slots():
        slots_h[...] = jnp.zeros_like(slots_h)
        slots_g[...] = jnp.zeros_like(slots_g)

    @pl.when(t < T)
    def _compute():
        xb = x_ref[0, 0]
        _spatial_chain_into(
            xb, (hw1, hw2, hw3, hw4), hb, work_h,
            i_tile=i_tile, TH=TH, W=W, WT=WT, X=X, H=H, slope=slope,
        )
        _deposit_slot(slots_h, work_h, t, TH, Xp)
        _spatial_chain_into(
            xb, (gw1, gw2, gw3, gw4), gb, work_g,
            i_tile=i_tile, TH=TH, W=W, WT=WT, X=X, H=H, slope=slope,
        )
        _deposit_slot(slots_g, work_g, t, TH, Xp)

    @pl.when(t == T)
    def _zero_future_slot():
        _zero_slot(slots_h, t, TH, W, Xp)
        _zero_slot(slots_g, t, TH, W, Xp)

    @pl.when(t > 0)
    def _emit():
        phase = t % 3
        h5 = _conv5_phase_dot(slots_h, hw5, hb5, phase, TH, W)
        g5 = _conv5_phase_dot(slots_g, gw5, gb5, phase, TH, W)
        sgn = -1.0 if rev else 1.0
        se = jnp.exp(sgn * clamp * (2.0 * jax.nn.sigmoid(h5) - 1.0))
        x2b = x2_ref[0, 0].astype(f32)
        y2 = (x2b - g5) * se if rev else x2b * se + g5
        y2_ref[0, 0] = y2.astype(y2_ref.dtype)
        se_ref[0, 0] = se.astype(se_ref.dtype)


def _pallas_impl_hg(x, x2, hws, hbs, hw5, hb5, gws, gbs, gw5, gb5,
                    clamp, rev):
    """x: (B,T,H,W,C) shared chain input; x2: (B,T,H,W,c_out) coupling
    counterpart. Returns (y2, exp(+-s)), both (B,T,H,W,c_out)."""
    B, T, H, W, C = x.shape
    WT = W
    Wp = _round_up(W, 16)
    if Wp != W:
        wpad = ((0, 0), (0, 0), (0, 0), (0, Wp - W), (0, 0))
        x = jnp.pad(x, wpad)
        x2 = jnp.pad(x2, wpad)
        W = Wp
    X = _round_up(C, GC)
    c_out = hw5.shape[-1]
    TH = _pick_tile_h_hg(H, X + 4 * GC)

    xp = jnp.pad(x, ((0, 0), (0, 0), (4, 4), (0, 0), (0, X - C)))
    hps = [_prep_weight(w.astype(x.dtype), C, X) for w in hws]
    gps = [_prep_weight(w.astype(x.dtype), C, X) for w in gws]
    hbss = jnp.stack([b.astype(jnp.float32) for b in hbs])
    gbss = jnp.stack([b.astype(jnp.float32) for b in gbs])
    hw5p = _prep_w5_v2(hw5.astype(x.dtype), C, X, c_out)
    gw5p = _prep_w5_v2(gw5.astype(x.dtype), C, X, c_out)
    hb5p = hb5.astype(jnp.float32).reshape(1, -1)
    gb5p = gb5.astype(jnp.float32).reshape(1, -1)

    kernel = partial(
        _hg_kernel, TH=TH, W=W, WT=WT, X=X, H=H, T=T, slope=0.2,
        clamp=float(clamp), rev=bool(rev),
    )
    w_spec = [
        pl.BlockSpec((3, X + GC * k, 3 * GC), lambda b, i, t: (0, 0, 0))
        for k in range(4)
    ]
    chain_specs = w_spec + [
        pl.BlockSpec((4, GC), lambda b, i, t: (0, 0)),
        pl.BlockSpec((3, 3 * (X + 4 * GC), c_out),
                     lambda b, i, t: (0, 0, 0)),
        pl.BlockSpec((1, c_out), lambda b, i, t: (0, 0)),
    ]
    lagged = pl.BlockSpec(
        (1, 1, TH, W, c_out),
        lambda b, i, t: (b, jnp.maximum(t - 1, 0), i, 0, 0),
    )
    y2, se = pl.pallas_call(
        kernel,
        grid=(B, H // TH, T + 1),
        out_shape=[
            jax.ShapeDtypeStruct((B, T, H, W, c_out), x.dtype),
            jax.ShapeDtypeStruct((B, T, H, W, c_out), x.dtype),
        ],
        in_specs=[
            pl.BlockSpec(
                (pl.Element(1), pl.Element(1), pl.Element(TH + 8),
                 pl.Element(W), pl.Element(X)),
                lambda b, i, t: (b, jnp.minimum(t, T - 1), i * TH, 0, 0),
            ),
            *chain_specs,
            *chain_specs,
            lagged,
        ],
        out_specs=[lagged, lagged],
        scratch_shapes=[
            pltpu.VMEM((TH + 8, W, X + 4 * GC), x.dtype),
            pltpu.VMEM((TH, W, 3 * (X + 4 * GC)), x.dtype),
            pltpu.VMEM((TH + 8, W, X + 4 * GC), x.dtype),
            pltpu.VMEM((TH, W, 3 * (X + 4 * GC)), x.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2 ** 20,
        ),
        interpret=jax.default_backend() == "cpu",
    )(xp, *hps, hbss, hw5p, hb5p, *gps, gbss, gw5p, gb5p, x2)
    if WT != W:
        y2 = y2[:, :, :, :WT, :]
        se = se[:, :, :, :WT, :]
    return y2, se


def _xla_hg(x, x2, hws, hbs, hw5, hb5, gws, gbs, gw5, gb5, clamp, rev):
    """XLA oracle/backward for the HG pair (same math, unfused)."""
    h5 = _xla_impl_v2(x, hws, hbs, hw5, hb5)
    g5 = _xla_impl_v2(x, gws, gbs, gw5, gb5)
    sgn = -1.0 if rev else 1.0
    se = jnp.exp(sgn * clamp * (2.0 * jax.nn.sigmoid(h5) - 1.0))
    y2 = (x2 - g5) * se if rev else x2 * se + g5
    return y2, se


@partial(jax.custom_vjp, nondiff_argnums=(10, 11))
def _hg_cv(x, x2, hws, hbs, hw5, hb5, gws, gbs, gw5, gb5, clamp, rev):
    B, T, H, W, C = x.shape
    if hg_shapes_ok(T, H, W, C, hw5.shape[-1]):
        return _pallas_impl_hg(
            x, x2, hws, hbs, hw5, hb5, gws, gbs, gw5, gb5, clamp, rev
        )
    return _xla_hg(x, x2, hws, hbs, hw5, hb5, gws, gbs, gw5, gb5, clamp, rev)


def _hg_fwd(x, x2, hws, hbs, hw5, hb5, gws, gbs, gw5, gb5, clamp, rev):
    args = (x, x2, hws, hbs, hw5, hb5, gws, gbs, gw5, gb5)
    return _hg_cv(*args, clamp, rev), args


def _hg_bwd(clamp, rev, res, g):
    _, vjp = jax.vjp(lambda *a: _xla_hg(*a, clamp, rev), *res)
    return vjp(g)


_hg_cv.defvjp(_hg_fwd, _hg_bwd)


def fused_hg_pair(x, x2, hws, hbs, hw5, hb5, gws, gbs, gw5, gb5, clamp, rev):
    """Both coupling subnets + the y2 combine in one launch.

    Returns (y2, exp(+-s)). Params are cast to the activation dtype BEFORE
    the custom_vjp (see fused_dense_chain_t) so the Pallas forward and the
    XLA backward oracle agree on every aval under mixed precision."""
    dt = x.dtype
    hws, hbs, hw5 = pad_gc_params(hws, hbs, hw5)
    gws, gbs, gw5 = pad_gc_params(gws, gbs, gw5)
    return _hg_cv(
        x, x2.astype(dt),
        tuple(w.astype(dt) for w in hws), tuple(b.astype(dt) for b in hbs),
        hw5.astype(dt), hb5.astype(dt),
        tuple(w.astype(dt) for w in gws), tuple(b.astype(dt) for b in gbs),
        gw5.astype(dt), gb5.astype(dt),
        float(clamp), bool(rev),
    )


# ===========================================================================
# "ride" variant: conv5 rides the spatial dots' spare N lanes (c_out <= 10)
# ===========================================================================
#
# The F chain's conv5 projects 176 channels down to THREE (N = 3 of 128
# MXU lanes, ~2% occupancy, yet ceil(576/128)=5 passes). When
# 96 + 3*c_out <= 128, each spatial conv dot gets 3*c_out extra output
# columns (zero except on the dy=1 dot) holding that feature's three
# temporal-tap contributions; a rotating 3-phase fp32 accumulator of
# (TH, W, 3*c_out) collects them and out(t-1) emits once frame t's
# contributions land. The conv5 dot, the slot buffer, and its per-cell
# deposit copy all disappear. x4 (not an input to any later conv) gets
# one tiny dedicated dot (K=32, N=3*c_out).
#
# NEGATIVE RESULT (measured on the v5e chip, flagship roundtrip bench):
# ride mode 83.6 fps vs 121.4 fps without — the widened (128-lane) dots
# on EVERY spatial conv plus the 3-phase accumulator roll/mask epilogue
# cost far more than the one eliminated narrow conv5 dot. Kept as an
# opt-in experiment (SELFC_TPU_PALLAS_RIDE=1), default OFF.


def ride_ok(c_out: int, W: int = 16) -> bool:
    if os.environ.get("SELFC_TPU_PALLAS_RIDE", "") != "1":
        return False
    # the ride kernel has no padded-W support (opt-in experiment)
    return 96 + 3 * c_out <= 128 and W % 16 == 0


def _prep_weight_ride(w, w5, C: int, X: int, feat: int):
    """Extend a conv's (3, K, 96) packed weight with the conv5 taps of the
    feature occupying the LAST GC lanes of its input (feat = 0 -> the x
    segment rides conv1). ext column block k (k = 0,1,2) holds w5[k]:
    frame t' contributes to out(t' + 1 - k). Non-center dy rows are zero
    (the temporal conv has no spatial taps)."""
    wt = _prep_weight(w, C, X)  # (3, K, 96)
    K = wt.shape[1]
    c_out = w5.shape[-1]
    ext = jnp.zeros((3, K, 3 * c_out), w.dtype)
    if feat == 0:
        rows = slice(0, C)          # x lanes (real channels only)
        w5rows = w5[:, :C]          # (3, C, c_out)
    else:
        rows = slice(K - GC, K)     # x_{feat} lanes
        base = w5.shape[1] - 4 * GC
        w5rows = w5[:, base + GC * (feat - 1):base + GC * feat]
    taps = jnp.concatenate([w5rows[k] for k in range(3)], axis=-1)
    ext = ext.at[1, rows].set(taps.astype(w.dtype))
    return jnp.concatenate([wt, ext], axis=-1)  # (3, K, 96 + 3*c_out)


def _prep_w5_x4(w5, c_out: int):
    """x4's conv5 taps as a dedicated (GC, 3*c_out) weight."""
    x4rows = w5[:, w5.shape[1] - GC:]  # (3, GC, c_out)
    return jnp.concatenate([x4rows[k] for k in range(3)], axis=-1)


def _chain_kernel_v2r(x_ref, w1, w2, w3, w4, b_ref, wx4_ref, b5_ref, *rest,
                      TH, W, X, H, T, slope, c_out, ep="none", clamp=1.0):
    n_aux = EP_AUX[ep]
    aux = rest[:n_aux]
    o_ref, work, acc5 = rest[n_aux], rest[n_aux + 1], rest[n_aux + 2]
    i_tile = pl.program_id(1)
    t = pl.program_id(2)
    f32 = jnp.float32
    w_refs = (w1, w2, w3, w4)
    NC = 3 * c_out

    @pl.when(t == 0)
    def _zero_acc():
        acc5[...] = jnp.zeros_like(acc5)

    @pl.when(t < T)
    def _compute():
        work[:, :, :X] = x_ref[0, 0, 1:TH + 9]
        for i in range(1, 5):
            kin = X + GC * (i - 1)
            ri0 = i - 1
            ro0, ro1 = i, TH + 8 - i
            r_out = ro1 - ro0
            w = w_refs[i - 1]
            part = None
            for dy in range(3):
                inp = work[ri0 + dy:ri0 + dy + r_out, :, :kin].reshape(
                    r_out * W, kin
                )
                d = jax.lax.dot_general(
                    inp, w[dy],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=f32,
                    precision=_mxu_precision(inp),
                )
                part = d if part is None else part + d
            part = part.reshape(r_out, W, 3 * GC + NC)
            # conv5 rider: part row j holds feature[i + j] (the dy=1 input
            # row); slice the output window rows [4, TH+4)
            j0 = 4 - i
            for k in range(3):
                # frame t contributes to out(t + 1 - k): phase (t+1-k)%3;
                # guard tau >= 0 (else frame 0's k=2 tap would pollute the
                # phase that later hosts out(2))
                seg = part[j0:j0 + TH, :, 3 * GC + k * c_out:
                           3 * GC + (k + 1) * c_out]
                for p in range(3):
                    @pl.when(((t + 1 - k) % 3 == p) & (t + 1 >= k))
                    def _acc(p=p, seg=seg):
                        acc5[:, :, p * c_out:(p + 1) * c_out] += seg
            ww = jax.lax.broadcasted_iota(jnp.int32, (r_out, W, 1), 1)
            a0 = pltpu.roll(part[:, :, 0:GC], 1, 1)
            a0 = jnp.where(ww >= 1, a0, 0.0)
            a2 = pltpu.roll(part[:, :, 2 * GC:3 * GC], W - 1, 1)
            a2 = jnp.where(ww <= W - 2, a2, 0.0)
            acc = a0 + part[:, :, GC:2 * GC] + a2
            acc = acc + b_ref[i - 1].astype(f32)
            acc = jnp.where(acc >= 0, acc, slope * acc)
            h0 = i_tile * TH + i - 4
            rr = jax.lax.broadcasted_iota(jnp.int32, (r_out, 1, 1), 0) + h0
            acc = jnp.where((rr >= 0) & (rr < H), acc, 0.0)
            work[ro0:ro1, :, X + GC * (i - 1):X + GC * i] = (
                acc.astype(work.dtype)
            )
        # x4's rider: one small dedicated dot over the output window
        inp4 = work[4:TH + 4, :, X + 3 * GC:X + 4 * GC].reshape(TH * W, GC)
        d4 = jax.lax.dot_general(
            inp4, wx4_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f32,
            precision=_mxu_precision(inp4),
        ).reshape(TH, W, NC)
        for k in range(3):
            for p in range(3):
                @pl.when(((t + 1 - k) % 3 == p) & (t + 1 >= k))
                def _acc4(p=p, k=k):
                    acc5[:, :, p * c_out:(p + 1) * c_out] += (
                        d4[:, :, k * c_out:(k + 1) * c_out]
                    )

    # emit out(t-1) from its phase segment, then recycle the segment
    for p in range(3):
        @pl.when(jnp.maximum(t - 1, 0) % 3 == p)
        def _emit(p=p):
            y5 = acc5[:, :, p * c_out:(p + 1) * c_out] + b5_ref[0].astype(
                jnp.float32
            )
            if ep != "none":
                aa = aux[0][0, 0].astype(jnp.float32) if n_aux >= 1 else None
                mm = aux[1][0, 0].astype(jnp.float32) if n_aux >= 2 else None
                y5 = ep_apply(y5, ep, clamp, aa, mm)
            o_ref[0, 0] = y5.astype(o_ref.dtype)

    @pl.when((t >= 1) & (t < T))
    def _recycle():
        for p in range(3):
            @pl.when((t - 1) % 3 == p)
            def _z(p=p):
                acc5[:, :, p * c_out:(p + 1) * c_out] = jnp.zeros(
                    (TH, W, c_out), jnp.float32
                )


def _pallas_impl_v2r(x, ws, bs, w5, b5, ep="none", clamp=1.0, a=None,
                     m=None):
    """Ride-mode whole-chain call; same semantics as _pallas_impl_v2."""
    B, T, H, W, C = x.shape
    X = _round_up(C, GC)
    c_out = w5.shape[-1]
    TH = _pick_tile_h_v2(H, X + 4 * GC, c_out, W, x.dtype.itemsize)

    xp = jnp.pad(x, ((0, 0), (0, 0), (5, 5), (0, 0), (0, X - C)))
    wps = [
        _prep_weight_ride(w.astype(x.dtype), w5.astype(x.dtype), C, X, i)
        for i, w in enumerate(ws)
    ]
    bss = jnp.stack([b.astype(jnp.float32) for b in bs])
    wx4 = _prep_w5_x4(w5.astype(x.dtype), c_out)
    b5p = b5.astype(jnp.float32).reshape(1, -1)

    kernel = partial(
        _chain_kernel_v2r, TH=TH, W=W, X=X, H=H, T=T, slope=0.2,
        c_out=c_out, ep=ep, clamp=clamp,
    )
    aux_arrays = [v for v in (a, m)[:EP_AUX[ep]]]
    aux_specs = [
        pl.BlockSpec(
            (1, 1, TH, W, c_out),
            lambda b, i, t: (b, jnp.maximum(t - 1, 0), i, 0, 0),
        )
        for _ in aux_arrays
    ]
    out = pl.pallas_call(
        kernel,
        grid=(B, H // TH, T + 1),
        out_shape=jax.ShapeDtypeStruct((B, T, H, W, c_out), x.dtype),
        in_specs=[
            pl.BlockSpec(
                (pl.Element(1), pl.Element(1), pl.Element(TH + 10),
                 pl.Element(W), pl.Element(X)),
                lambda b, i, t: (b, jnp.minimum(t, T - 1), i * TH, 0, 0),
            ),
            *[
                pl.BlockSpec((3, X + GC * k, 3 * GC + 3 * c_out),
                             lambda b, i, t: (0, 0, 0))
                for k in range(4)
            ],
            pl.BlockSpec((4, GC), lambda b, i, t: (0, 0)),
            pl.BlockSpec((GC, 3 * c_out), lambda b, i, t: (0, 0)),
            pl.BlockSpec((1, c_out), lambda b, i, t: (0, 0)),
            *aux_specs,
        ],
        out_specs=pl.BlockSpec(
            (1, 1, TH, W, c_out),
            lambda b, i, t: (b, jnp.maximum(t - 1, 0), i, 0, 0),
        ),
        scratch_shapes=[
            pltpu.VMEM((TH + 8, W, X + 4 * GC), x.dtype),
            pltpu.VMEM((TH, W, 3 * c_out), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2 ** 20,
        ),
        interpret=jax.default_backend() == "cpu",
    )(xp, *wps, bss, wx4, b5p, *[v.astype(x.dtype) for v in aux_arrays])
    return out


# --- epilogue-fused entry points -------------------------------------------


def _xla_impl_v2_ep(ep, clamp, x, ws, bs, w5, b5, *aux):
    y = _xla_impl_v2(x, ws, bs, w5, b5)
    a = aux[0] if len(aux) >= 1 else None
    m = aux[1] if len(aux) >= 2 else None
    return ep_apply(y, ep, clamp, a, m)


from functools import lru_cache  # noqa: E402
import contextlib  # noqa: E402

# Persistent W-packing across a whole coupling chain (round-5): the
# caller packs (B -> B/P stripes) ONCE before the 8-block chain and
# unpacks once after, instead of every chain call paying its own
# _pack_w/_unpack_w transpose pair (54 pack+unpack transposes per train
# step -> 8; they were most of the profile's 7.2 ms data-formatting
# bucket, docs/PERF.md round-4 attribution). Trace-time-only state: the
# stripe is captured as a STATIC factory key below, so the custom-VJP
# backward (traced later, outside the scope) still sees it.
_PREPACK = [0]


@contextlib.contextmanager
def prepacked_chain(stripe: int):
    """Inside this scope, chain inputs are already W-packed with stripe
    width ``stripe`` — fused_dense_chain_t_ep skips its own pack/unpack
    and passes the stripe masks straight to the kernels."""
    prev = _PREPACK[0]
    _PREPACK[0] = int(stripe)
    try:
        yield
    finally:
        _PREPACK[0] = prev


def prepack_stripe() -> int:
    return _PREPACK[0]


@lru_cache(maxsize=None)
def _fused_chain_ep(ep: str, clamp: float, n_aux: int, stripe: int = 0):
    """custom-VJP'd whole-chain call with a fused coupling epilogue.
    Keyed by the static (ep, clamp, stripe) triple; backward re-derives
    through the XLA formulation (rematerialization, as the base kernel
    does). ``stripe`` > 0 = inputs arrive already W-packed with that
    stripe width (see prepacked_chain)."""

    def prim(x, ws, bs, w5, b5, *aux):
        if stripe:
            return _pallas_impl_v2(
                x, ws, bs, w5, b5, ep=ep, clamp=clamp,
                a=aux[0] if n_aux >= 1 else None,
                m=aux[1] if n_aux >= 2 else None,
                stripe_w=stripe,
            )
        if ride_ok(w5.shape[-1], x.shape[3]):
            return _pallas_impl_v2r(
                x, ws, bs, w5, b5, ep=ep, clamp=clamp,
                a=aux[0] if n_aux >= 1 else None,
                m=aux[1] if n_aux >= 2 else None,
            )
        P = (_pick_pack_w(x.shape[0], x.shape[3])
             if pack_w_enabled() else 1)
        if P > 1:
            WS = x.shape[3]
            y = _pallas_impl_v2(
                _pack_w(x, P), ws, bs, w5, b5, ep=ep, clamp=clamp,
                a=_pack_w(aux[0], P) if n_aux >= 1 else None,
                m=_pack_w(aux[1], P) if n_aux >= 2 else None,
                stripe_w=WS,
            )
            return _unpack_w(y, P)
        return _pallas_impl_v2(
            x, ws, bs, w5, b5, ep=ep, clamp=clamp,
            a=aux[0] if n_aux >= 1 else None,
            m=aux[1] if n_aux >= 2 else None,
        )

    def fwd(x, ws, bs, w5, b5, *aux):
        if stripe:
            if _save_feats_active(x, w5):
                y, feats = _pallas_impl_v2(
                    x, ws, bs, w5, b5, ep=ep, clamp=clamp,
                    a=aux[0] if n_aux >= 1 else None,
                    m=aux[1] if n_aux >= 2 else None,
                    emit_feats=True, stripe_w=stripe,
                )
                return y, (x, ws, bs, w5, b5, aux, feats)
            return prim(x, ws, bs, w5, b5, *aux), (x, ws, bs, w5, b5,
                                                   aux, None)
        if _save_feats_active(x, w5) and not ride_ok(w5.shape[-1],
                                                     x.shape[3]):
            P = (_pick_pack_w(x.shape[0], x.shape[3])
                 if pack_w_enabled() else 1)
            if P > 1:
                y, feats = _pallas_impl_v2(
                    _pack_w(x, P), ws, bs, w5, b5, ep=ep, clamp=clamp,
                    a=_pack_w(aux[0], P) if n_aux >= 1 else None,
                    m=_pack_w(aux[1], P) if n_aux >= 2 else None,
                    emit_feats=True, stripe_w=x.shape[3],
                )
                return _unpack_w(y, P), (x, ws, bs, w5, b5, aux, feats)
            y, feats = _pallas_impl_v2(
                x, ws, bs, w5, b5, ep=ep, clamp=clamp,
                a=aux[0] if n_aux >= 1 else None,
                m=aux[1] if n_aux >= 2 else None,
                emit_feats=True,
            )
            return y, (x, ws, bs, w5, b5, aux, feats)
        return prim(x, ws, bs, w5, b5, *aux), (x, ws, bs, w5, b5, aux, None)

    def bwd(res, g):
        x, ws, bs, w5, b5, aux, feats_p = res
        if chain_bwd_enabled() and chain_bwd_ok(*x.shape[-3:]):
            if stripe:
                P, WS = 1, stripe
                xw, gw, auxw = x, g, aux
            else:
                if feats_p is not None:
                    P = x.shape[0] // feats_p.shape[0]
                else:
                    P = (_pick_pack_w(x.shape[0], x.shape[3])
                         if pack_w_enabled() else 1)
                WS = x.shape[3] if P > 1 else None
                xw = _pack_w(x, P) if P > 1 else x
                gw = _pack_w(g, P) if P > 1 else g
                auxw = tuple(_pack_w(v, P) for v in aux) if P > 1 else aux
            if feats_p is None:
                feats_p = _pallas_feats(xw, ws, bs, keep_pad=True,
                                        stripe_w=WS)
            feats = feats_p[..., :xw.shape[-2], :]

            def head(x, feats, w5, b5, *aux):
                y = _conv5_head(x, feats, w5, b5)
                a = aux[0] if len(aux) >= 1 else None
                m = aux[1] if len(aux) >= 2 else None
                return ep_apply(y, ep, clamp, a, m)

            _, vjp5 = jax.vjp(head, xw, feats, w5, b5, *auxw)
            dx_direct, dfeats, dw5, db5, *daux = vjp5(gw)
            dx_chain, dws, dbs = _pallas_bwd(
                xw, ws, bs, dfeats, feats=feats_p, stripe_w=WS,
            )
            dx = dx_direct + dx_chain
            if P > 1:
                dx = _unpack_w(dx, P)
                daux = [_unpack_w(v, P) for v in daux]
            return (dx, dws, dbs, dw5, db5, *daux)
        if stripe:
            # the XLA oracle has no stripe masks — a packed fallback would
            # leak conv taps across stripe boundaries. The packed driver
            # (models/inv_nets._chain_pair) checks chain_bwd_ok up front,
            # so this only fires on a misconfigured manual scope.
            raise NotImplementedError(
                "prepacked chain requires the fused Pallas backward "
                "(chain_bwd_ok failed for this shape)"
            )
        _, vjp = jax.vjp(
            lambda x, ws, bs, w5, b5, *aux: _xla_impl_v2_ep(
                ep, clamp, x, ws, bs, w5, b5, *aux
            ),
            x, ws, bs, w5, b5, *aux,
        )
        return vjp(g)

    f = jax.custom_vjp(prim)
    f.defvjp(fwd, bwd)
    return f


def fused_dense_chain_t_ep(x, ws, bs, w5, b5, ep_mode, clamp, a=None, m=None):
    """fused_dense_chain_t with the coupling epilogue applied in-kernel.

    Params AND epilogue aux are cast to the activation dtype before the
    custom_vjp (see fused_dense_chain_t) so the kernel and the XLA
    backward oracle agree on every aval under mixed precision. gc<32
    chains are zero-padded to the kernel's 32-lane growth."""
    dt = x.dtype
    ws, bs, w5 = pad_gc_params(ws, bs, w5)
    n_aux = EP_AUX[ep_mode]
    aux = tuple(v.astype(dt) for v in (a, m)[:n_aux])
    return _fused_chain_ep(ep_mode, float(clamp), n_aux, prepack_stripe())(
        x, tuple(w.astype(dt) for w in ws), tuple(b.astype(dt) for b in bs),
        w5.astype(dt), b5.astype(dt), *aux
    )


# ===========================================================================
# backward: fused adjoint of the spatial chain
# ===========================================================================
#
# The round-2 custom-VJPs rematerialized through the UNfused XLA chain:
# backward cost = XLA fwd recompute + XLA adjoint, both memory-bound with
# the same idle-lane problem the forward kernel fixed. This section fuses
# the chain adjoint the same way the forward is fused:
#
# * one grid step per (frame, row-tile) recomputes the forward work buffer
#   in VMEM (cheap — it IS the fused forward; LeakyReLU masks come free
#   from the post-activation signs since lrelu preserves sign);
# * a reverse sweep k=4..1 over the convs: dacc = dout * lrelu'(out),
#   the rolled-edge-add adjoint rebuilds the dx-packed dpart, then per
#   kernel row dy: ONE MXU dot accumulates dW[dy] (+= work_shift^T @
#   dpart) and ONE MXU dot spreads dwork[..:kin] (+= dpart @ w[dy]^T) —
#   exactly mirroring the forward's 3-dot scheme;
# * dW/db accumulate across the whole sequential TPU grid directly in
#   their output blocks (constant index maps keep them VMEM-resident);
# * dx is emitted per tile WITH its 4-row halos (each tile's chain is an
#   independent function of its padded input window; tile outputs are
#   disjoint, so summing per-tile input-gradients is exact) and
#   overlap-added in XLA (nt <= 6 static adds).
#
# The temporal conv5 (and any coupling epilogue) adjoint stays in XLA —
# it is matmul-shaped and elementwise — over feats from a spatial-only
# Pallas forward (`_pallas_feats`), so the unfused XLA chain never runs.


def _chain_bwd_kernel(x_ref, *rest, TH, W, WT, X, H, slope, saved=False,
                      WS=None, merged=False):
    if saved:
        f_ref, w1, w2, w3, w4, b_ref, g_ref = rest[:7]
        outs = rest[7:]
    else:
        f_ref = None
        w1, w2, w3, w4, b_ref, g_ref = rest[:6]
        outs = rest[6:]
    dx_ref, dw1, dw2, dw3, dw4, db_ref, work, dwork = outs
    bt = pl.program_id(0)
    i_tile = pl.program_id(1)
    f32 = jnp.float32
    w_refs = (w1, w2, w3, w4)
    dw_refs = (dw1, dw2, dw3, dw4)

    @pl.when(jnp.logical_and(bt == 0, i_tile == 0))
    def _zero_param_grads():
        for dwr in dw_refs:
            dwr[...] = jnp.zeros_like(dwr)
        db_ref[...] = jnp.zeros_like(db_ref)

    if saved:
        # 1. work = [x | x1..x4] loaded from the forward's saved features
        # (halo rows come from neighbor tiles' saves — globally exact, same
        # values the recompute produces)
        work[:, :, :X] = x_ref[0]
        work[:, :, X:] = f_ref[0]
    else:
        # 1. forward recompute: work = [x | x1..x4] for this tile (+halos)
        _spatial_chain_into(
            x_ref[0], w_refs, b_ref, work,
            i_tile=i_tile, TH=TH, W=W, WT=WT, X=X, H=H, slope=slope, WS=WS,
        )

    # 2. seed dwork with the output cotangent on the central rows
    dwork[...] = jnp.zeros_like(dwork)
    dwork[4:TH + 4, :, X:] = g_ref[0].astype(f32)

    # 3. reverse sweep
    if WS is None:
        WS = W
    ww_full = jax.lax.broadcasted_iota(jnp.int32, (1, W, 1), 1)
    ws_col = ww_full % WS if WS < W else ww_full
    for k in (4, 3, 2, 1):
        kin = X + GC * (k - 1)
        ri0 = k - 1
        ro0, ro1 = k, TH + 8 - k
        r_out = ro1 - ro0
        out_k = work[ro0:ro1, :, X + GC * (k - 1):X + GC * k]
        dout = dwork[ro0:ro1, :, X + GC * (k - 1):X + GC * k]
        # both where-branches stay full vectors (a scalar branch hits a
        # Mosaic relayout error on the i1 mask) and the sign test runs in
        # f32 (Mosaic rejects bf16 vector compares on this target)
        dacc = jnp.where(out_k.astype(f32) > 0, dout, dout * slope)
        # adjoint of the forward's row/col masks (they forced out to 0)
        h0 = i_tile * TH + k - 4
        rr = jax.lax.broadcasted_iota(jnp.int32, (r_out, 1, 1), 0) + h0
        ok = (rr >= 0) & (rr < H)
        if WT < W:
            ok = ok & (ww_full < WT)
        dacc = jnp.where(ok, dacc, 0.0)
        # db
        db_ref[k - 1:k, :] = db_ref[k - 1:k, :] + jnp.sum(
            dacc, axis=(0, 1)
        ).reshape(1, GC)
        # adjoint of the rolled edge adds: rebuild the dx-packed dpart
        # (stripe-aware: the forward masked the dx taps at stripe edges)
        dp0 = pltpu.roll(jnp.where(ws_col >= 1, dacc, 0.0), W - 1, 1)
        dp2 = pltpu.roll(jnp.where(ws_col <= WS - 2, dacc, 0.0), 1, 1)
        dpart = jnp.concatenate([dp0, dacc, dp2], axis=-1)
        dpart_c = dpart.astype(work.dtype).reshape(r_out * W, 3 * GC)
        if merged:
            # dy-merged contractions: ONE dW dot and ONE dinp dot per
            # conv instead of three each (24 -> 8 MXU launches per tile).
            # The chain dots are launch-bound (~1us each regardless of
            # K<128 — docs/PERF.md), so fewer, wider dots win as long as
            # the operand assembly is cheap: inp3 is a lane-axis concat
            # of 3 row-shifted views of `work` (VPU copies), wcat is a
            # free leading-dims reshape of the weight ref.
            inp3 = jnp.concatenate(
                [work[ri0 + dy:ri0 + dy + r_out, :, :kin]
                 for dy in range(3)], axis=-1,
            ).reshape(r_out * W, 3 * kin)
            dwk3 = jax.lax.dot_general(
                inp3, dpart_c,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=f32,
                precision=_mxu_precision(inp3),
            )  # (3*kin, 3*GC)
            for dy in range(3):
                dw_refs[k - 1][dy] = (
                    dw_refs[k - 1][dy] + dwk3[dy * kin:(dy + 1) * kin]
                )
            wcat = w_refs[k - 1][...].reshape(3 * kin, 3 * GC)
            dinp3 = jax.lax.dot_general(
                dpart_c, wcat,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=f32,
                precision=_mxu_precision(dpart_c),
            ).reshape(r_out, W, 3 * kin)
            for dy in range(3):
                dwork[ri0 + dy:ri0 + dy + r_out, :, :kin] = (
                    dwork[ri0 + dy:ri0 + dy + r_out, :, :kin]
                    + dinp3[:, :, dy * kin:(dy + 1) * kin]
                )
        else:
            for dy in range(3):
                inp = work[ri0 + dy:ri0 + dy + r_out, :, :kin].reshape(
                    r_out * W, kin
                )
                dwk = jax.lax.dot_general(
                    inp, dpart_c,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=f32,
                    precision=_mxu_precision(inp),
                )  # (kin, 3*GC)
                dw_refs[k - 1][dy] = dw_refs[k - 1][dy] + dwk
                dinp = jax.lax.dot_general(
                    dpart_c, w_refs[k - 1][dy],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=f32,
                    precision=_mxu_precision(dpart_c),
                ).reshape(r_out, W, kin)
                dwork[ri0 + dy:ri0 + dy + r_out, :, :kin] = (
                    dwork[ri0 + dy:ri0 + dy + r_out, :, :kin] + dinp
                )

    # 4. emit this tile's input-gradient window (halos included)
    dx_ref[0, 0] = dwork[:, :, :X]


def _pick_tile_h_bwd(H: int, W: int, X: int) -> int | None:
    lanes = X + 4 * GC
    forced = os.environ.get("SELFC_TPU_TILE_H_BWD", "")
    # 24 measured best at the flagship eval latent (H=144); 36/18 exist so
    # that train-config latents (H=36) don't fall through to TH=12, whose
    # (12+8)/12 halo recompute costs ~1.4x more dot FLOPs than TH=36.
    order = (int(forced),) if forced else (24, 36, 18, 16, 12, 8, 6, 4)
    for th in order:
        if H % th != 0:
            continue
        need = (
            (th + 8) * W * lanes * 2      # work (act dtype, assume bf16+)
            + (th + 8) * W * lanes * 4    # dwork f32
            + (th + 6) * W * 96 * 4       # dpart f32
            + (4 * X + 6 * GC) * 3 * 96 * 4  # dW blocks f32
            + 2 * (th + 8) * W * X * 2    # x window (dbl buffered)
            + 2 * (th + 8) * W * 4 * GC * 2  # saved-feats window (dbl buf)
            + 2 * th * W * 4 * GC * 2     # g window
            + 2 * (th + 8) * W * X * 4    # dx out block f32
        )
        if need < 48 * 2 ** 20:
            return th
    return None


def chain_bwd_ok(H: int, W: int, C: int) -> bool:
    X = _round_up(C, GC)
    return _pick_tile_h_bwd(H, _round_up(W, 16), X) is not None


def chain_bwd_enabled() -> bool:
    """Fused chain adjoint; SELFC_TPU_PALLAS_BWD=0 disables, =1 forces
    (interpret mode off-TPU, used by tests). Default follows the forward
    kernel gate."""
    flag = os.environ.get("SELFC_TPU_PALLAS_BWD", "")
    if flag == "0":
        return False
    if flag == "1":
        return True
    return chain_fused_enabled()


def _unprep_weight(dwp, C: int, X: int, Cin: int):
    """Adjoint of _prep_weight: (3, kin, 3*GC) -> (3, 3, Cin, GC); the
    zero-pad rows C..X carry no gradient (they were constants)."""
    if X != C:
        dwp = jnp.concatenate([dwp[:, :C], dwp[:, X:]], axis=1)
    return jnp.transpose(dwp.reshape(3, Cin, 3, GC), (0, 2, 1, 3))


def _pallas_bwd(x, ws, bs, g, feats=None, stripe_w=None):
    """Adjoint of the spatial chain: returns (dx, dws, dbs).

    x: (B[,T],H,W,C) primal input; g: cotangent of the (x1..x4) concat,
    same leading dims with 4*GC channels. ``feats``, when given, is the
    forward kernel's saved (x1..x4) concat at the PADDED width Wp (from
    ``_pallas_impl_v2(..., emit_feats=True)``): the kernel then loads the
    work buffer instead of recomputing the spatial chain — 12 of 36 MXU
    dots per chain saved."""
    lead = x.shape[:-3]
    H, W, C = x.shape[-3:]
    BT = 1
    for d in lead:
        BT *= d
    WT = W
    Wp = _round_up(W, 16)
    X = _round_up(C, GC)
    TH = _pick_tile_h_bwd(H, Wp, X)
    nt = H // TH

    xr = x.reshape(BT, H, W, C)
    gr = g.reshape(BT, H, W, 4 * GC)
    if Wp != W:
        xr = jnp.pad(xr, ((0, 0), (0, 0), (0, Wp - W), (0, 0)))
        gr = jnp.pad(gr, ((0, 0), (0, 0), (0, Wp - W), (0, 0)))
    xp = jnp.pad(xr, ((0, 0), (4, 4), (0, 0), (0, X - C)))
    wps = [_prep_weight(w.astype(x.dtype), C, X) for w in ws]
    bss = jnp.stack([b.astype(jnp.float32) for b in bs])
    saved = feats is not None
    feats_args = ()
    feats_specs = ()
    if saved:
        fr = feats.reshape(BT, H, Wp, 4 * GC)
        fp = jnp.pad(fr, ((0, 0), (4, 4), (0, 0), (0, 0)))
        feats_args = (fp,)
        feats_specs = (pl.BlockSpec(
            (pl.Element(1), pl.Element(TH + 8), pl.Element(Wp),
             pl.Element(4 * GC)),
            lambda bt, i: (bt, i * TH, 0, 0),
        ),)

    kernel = partial(
        _chain_bwd_kernel, TH=TH, W=Wp, WT=WT, X=X, H=H, slope=0.2,
        saved=saved, WS=stripe_w,
        # dy-merged contractions (8 vs 24 MXU launches/tile) default OFF:
        # the on-chip A/B (runs/400k/profile_r05.txt) measured the merged
        # path at 107.7 ms/step vs 97.6 ms with it off — the bigger
        # per-launch dy/dW working set loses more to VMEM pressure than
        # the launch overhead it saves. Opt back in with
        # SELFC_TPU_PALLAS_BWD_MERGED=1.
        merged=os.environ.get("SELFC_TPU_PALLAS_BWD_MERGED", "0") != "0",
    )
    f32 = jnp.float32
    dxp, *dwp_db = pl.pallas_call(
        kernel,
        grid=(BT, nt),
        out_shape=[
            jax.ShapeDtypeStruct((BT, nt, TH + 8, Wp, X), f32),
            *[jax.ShapeDtypeStruct((3, X + GC * k, 3 * GC), f32)
              for k in range(4)],
            jax.ShapeDtypeStruct((4, GC), f32),
        ],
        in_specs=[
            pl.BlockSpec(
                (pl.Element(1), pl.Element(TH + 8), pl.Element(Wp),
                 pl.Element(X)),
                lambda bt, i: (bt, i * TH, 0, 0),
            ),
            *feats_specs,
            *[
                pl.BlockSpec((3, X + GC * k, 3 * GC), lambda bt, i: (0, 0, 0))
                for k in range(4)
            ],
            pl.BlockSpec((4, GC), lambda bt, i: (0, 0)),
            pl.BlockSpec((1, TH, Wp, 4 * GC), lambda bt, i: (bt, i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, TH + 8, Wp, X),
                         lambda bt, i: (bt, i, 0, 0, 0)),
            *[
                pl.BlockSpec((3, X + GC * k, 3 * GC), lambda bt, i: (0, 0, 0))
                for k in range(4)
            ],
            pl.BlockSpec((4, GC), lambda bt, i: (0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((TH + 8, Wp, X + 4 * GC), x.dtype),
            pltpu.VMEM((TH + 8, Wp, X + 4 * GC), f32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2 ** 20,
        ),
        interpret=jax.default_backend() == "cpu",
    )(xp, *feats_args, *wps, bss, gr)

    # overlap-add the per-tile halo windows (static, nt <= ~6)
    dx_pad = jnp.zeros((BT, H + 8, Wp, X), f32)
    for i in range(nt):
        dx_pad = jax.lax.dynamic_update_slice(
            dx_pad,
            jax.lax.dynamic_slice(
                dx_pad, (0, i * TH, 0, 0), (BT, TH + 8, Wp, X)
            ) + dxp[:, i],
            (0, i * TH, 0, 0),
        )
    dx = dx_pad[:, 4:H + 4, :WT, :C].astype(x.dtype).reshape(x.shape)

    dws_p, db = dwp_db[:4], dwp_db[4]
    dws = tuple(
        _unprep_weight(dwp, C, X, ws[k].shape[2]).astype(ws[k].dtype)
        for k, dwp in enumerate(dws_p)
    )
    dbs = tuple(db[k].astype(bs[k].dtype) for k in range(4))
    return dx, dws, dbs


def _pallas_feats(x, ws, bs, keep_pad=False, stripe_w=None):
    """Spatial-only fused forward that handles arbitrary W (v2's pad-col
    scheme): returns the (x1..x4) concat. Used by the fused backward of
    the whole-chain (conv5) entry points, where the conv5/epilogue adjoint
    needs the chain features. ``keep_pad`` returns the kernel's padded
    width Wp (what ``_pallas_bwd``'s saved-feats path consumes)."""
    lead = x.shape[:-3]
    H, W, C = x.shape[-3:]
    BT = 1
    for d in lead:
        BT *= d
    WT = W
    Wp = _round_up(W, 16)
    X = _round_up(C, GC)
    TH = _pick_tile_h_bwd(H, Wp, X)

    xr = x.reshape(BT, H, W, C)
    if Wp != W:
        xr = jnp.pad(xr, ((0, 0), (0, 0), (0, Wp - W), (0, 0)))
    xp = jnp.pad(xr, ((0, 0), (4, 4), (0, 0), (0, X - C)))
    wps = [_prep_weight(w.astype(x.dtype), C, X) for w in ws]
    bss = jnp.stack([b.astype(jnp.float32) for b in bs])

    def kernel(x_ref, w1, w2, w3, w4, b_ref, o_ref, work):
        _spatial_chain_into(
            x_ref[0], (w1, w2, w3, w4), b_ref, work,
            i_tile=pl.program_id(1), TH=TH, W=Wp, WT=WT, X=X, H=H,
            slope=0.2, WS=stripe_w,
        )
        o_ref[0] = work[4:TH + 4, :, X:]

    out = pl.pallas_call(
        kernel,
        grid=(BT, H // TH),
        out_shape=jax.ShapeDtypeStruct((BT, H, Wp, 4 * GC), x.dtype),
        in_specs=[
            pl.BlockSpec(
                (pl.Element(1), pl.Element(TH + 8), pl.Element(Wp),
                 pl.Element(X)),
                lambda bt, i: (bt, i * TH, 0, 0),
            ),
            *[
                pl.BlockSpec((3, X + GC * k, 3 * GC), lambda bt, i: (0, 0, 0))
                for k in range(4)
            ],
            pl.BlockSpec((4, GC), lambda bt, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, TH, Wp, 4 * GC),
                               lambda bt, i: (bt, i, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((TH + 8, Wp, X + 4 * GC), x.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2 ** 20,
        ),
        interpret=jax.default_backend() == "cpu",
    )(xp, *wps, bss)
    if keep_pad:
        return out.reshape(*lead, H, Wp, 4 * GC)
    if Wp != W:
        out = out[:, :, :W]
    return out.reshape(*lead, H, W, 4 * GC)
