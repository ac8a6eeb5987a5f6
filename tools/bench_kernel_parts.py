#!/usr/bin/env python
"""Decompose fused-chain kernel time: dots-only vs +vpu epilogue vs full."""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GC = 32


def timed_chain(fn_step, x0, n1=8, n2=72, reps=3):
    @partial(jax.jit, static_argnums=(1,))
    def chain(x, n):
        def body(i, x):
            return fn_step(x)
        out = jax.lax.fori_loop(0, n, body, x)
        leaf = jax.tree_util.tree_leaves(out)[0]
        return jnp.sum(leaf[(0,) * (leaf.ndim - 1)].astype(jnp.float32))

    float(chain(x0, n1)); float(chain(x0, n2))

    def run(n):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(chain(x0, n))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    return (run(n2) - run(n1)) / (n2 - n1)


def make_kernel(mode, TH, W, WP, X, H):
    def kernel(x_ref, w1, w2, w3, w4, b_ref, o_ref, work):
        f32 = jnp.float32
        w_refs = (w1, w2, w3, w4)
        work[:, :, :X] = x_ref[0]
        if mode in ("dots", "noshift"):
            for i in range(1, 5):
                kin = X + GC * (i - 1)
                ri0 = i - 1
                ro0, ro1 = i, TH + 8 - i
                r_out = ro1 - ro0
                w = w_refs[i - 1]
                part = None
                for dy in range(3):
                    sh = 0 if mode == "noshift" else dy
                    inp = work[ri0 + sh:ri0 + sh + r_out, :, :kin].reshape(
                        r_out * WP, kin)
                    d = jax.lax.dot_general(
                        inp, w[dy],
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=f32)
                    part = d if part is None else part + d
                # minimal epilogue: cast + write one GC slice (keeps deps)
                pb = part.reshape(r_out, WP, 3 * GC)[:, :, :GC]
                work[ro0:ro1, :, X + GC * (i - 1):X + GC * i] = (
                    pb.astype(work.dtype))
            o_ref[0] = work[4:TH + 4, 1:W + 1, X:X + 4 * GC]
            return
        # full (mirrors production kernel)
        i_tile = pl.program_id(1)
        work[:, 0:1, X:] = jnp.zeros((TH + 8, 1, 4 * GC), work.dtype)
        work[:, W + 1:WP, X:] = jnp.zeros((TH + 8, WP - W - 1, 4 * GC),
                                          work.dtype)
        for i in range(1, 5):
            kin = X + GC * (i - 1)
            ri0 = i - 1
            ro0, ro1 = i, TH + 8 - i
            r_out = ro1 - ro0
            w = w_refs[i - 1]
            part = None
            for dy in range(3):
                inp = work[ri0 + dy:ri0 + dy + r_out, :, :kin].reshape(
                    r_out * WP, kin)
                d = jax.lax.dot_general(
                    inp, w[dy],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=f32)
                part = d if part is None else part + d
            part = part.reshape(r_out, WP, 3 * GC)
            acc = jnp.broadcast_to(b_ref[i - 1].astype(f32), (r_out, W, GC))
            for dx in range(3):
                acc = acc + part[:, dx:dx + W, GC * dx:GC * (dx + 1)]
            acc = jnp.where(acc >= 0, acc, 0.2 * acc)
            h0 = i_tile * TH + i - 4
            rr = jax.lax.broadcasted_iota(jnp.int32, (r_out, 1, 1), 0) + h0
            acc = jnp.where((rr >= 0) & (rr < H), acc, 0.0)
            work[ro0:ro1, 1:W + 1, X + GC * (i - 1):X + GC * i] = (
                acc.astype(work.dtype))
        o_ref[0] = work[4:TH + 4, 1:W + 1, X:X + 4 * GC]

    return kernel


def run_variant(mode, C, TH=24):
    from selfc_tpu.ops.pallas_chain import _prep_weight, _round_up

    rng = np.random.default_rng(0)
    B, T, H, W = 1, 7, 144, 176
    dt = jnp.bfloat16
    X = _round_up(C, GC)
    WP = _round_up(W + 2, 16)
    BT = B * T
    ws = tuple(
        jnp.asarray(rng.normal(0, 0.02, (3, 3, C + i * GC, GC)), dt)
        for i in range(4))
    bs = jnp.stack([jnp.zeros((GC,), jnp.float32) for _ in range(4)])
    wps = [_prep_weight(w, C, X) for w in ws]
    x = jnp.asarray(rng.random((BT, H, W, C)), dt)
    xp = jnp.pad(x, ((0, 0), (4, 4), (1, WP - W - 1), (0, X - C)))

    kern = make_kernel(mode, TH, W, WP, X, H)
    call = pl.pallas_call(
        kern,
        grid=(BT, H // TH),
        out_shape=jax.ShapeDtypeStruct((BT, H, W, 4 * GC), dt),
        in_specs=[
            pl.BlockSpec((pl.Element(1), pl.Element(TH + 8), pl.Element(WP),
                          pl.Element(X)), lambda bt, i: (bt, i * TH, 0, 0)),
            *[pl.BlockSpec((3, X + GC * k, 3 * GC), lambda bt, i: (0, 0, 0))
              for k in range(4)],
            pl.BlockSpec((4, GC), lambda bt, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, TH, W, 4 * GC),
                               lambda bt, i: (bt, i, 0, 0)),
        scratch_shapes=[pltpu.VMEM((TH + 8, WP, X + 4 * GC), dt)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2 ** 20),
    )

    def step(xin):
        y = call(xin, *wps, bs)
        fb = jnp.mean(y).astype(xin.dtype) * 1e-6
        return xin + fb  # consumes every output channel

    t = timed_chain(step, xp)
    macs = BT * H * W * sum(9 * (C + i * GC) * GC for i in range(4))
    print(f"C={C} TH={TH} mode={mode:5s}: {t*1e3:.3f} ms "
          f"({macs*2/t/1e12:.1f} TF/s)")


if __name__ == "__main__":
    for C in (48, 3):
        for mode in ("dots", "noshift", "full"):
            run_variant(mode, C)
