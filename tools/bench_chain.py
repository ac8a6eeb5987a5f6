#!/usr/bin/env python
"""Microbench: fused_dense_spatial vs XLA chain vs pure-matmul roof."""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def timed_chain(fn_step, x0, n1=4, n2=12, reps=3):
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


def main():
    from selfc_tpu.ops.pallas_chain import _pallas_impl, _xla_impl

    rng = np.random.default_rng(0)
    B, T, H, W = 1, 7, 144, 176
    dt = jnp.bfloat16
    GC = 32

    for name, C in [("F-chain (48ch)", 48), ("H/G-chain (3ch)", 3)]:
        ws = tuple(
            jnp.asarray(rng.normal(0, 0.02, (3, 3, C + i * GC, GC)), dt)
            for i in range(4)
        )
        bs = tuple(jnp.zeros((GC,), dt) for _ in range(4))
        x = jnp.asarray(rng.random((B, T, H, W, C)), dt)

        def pallas_step(xin):
            y = _pallas_impl(xin, ws, bs)
            # consume EVERY output channel so XLA cannot DCE any conv
            fb = jnp.mean(y, axis=-1, keepdims=True) * 1e-6
            return xin.at[..., :1].add(fb.astype(xin.dtype))

        def xla_step(xin):
            y = _xla_impl(xin, ws, bs)
            fb = jnp.mean(y, axis=-1, keepdims=True) * 1e-6
            return xin.at[..., :1].add(fb.astype(xin.dtype))

        macs = B * T * H * W * sum(
            9 * (C + i * GC) * GC for i in range(4)
        )
        tp = timed_chain(pallas_step, x, n1=8, n2=72)
        tx = timed_chain(xla_step, x, n1=8, n2=72)
        print(f"{name}: pallas {tp*1e3:.3f} ms ({macs*2/tp/1e12:.1f} TF/s) "
              f"xla {tx*1e3:.3f} ms ({macs*2/tx/1e12:.1f} TF/s)")

    # pure matmul roofs at the same dot shapes the kernel issues
    rows = 20 * 192  # (TH+8-2i)*WP at TH=12 roughly
    for kin in (32, 64, 96, 128, 160):
        a = jnp.asarray(rng.random((rows, kin)), dt)
        w = jnp.asarray(rng.normal(0, 0.02, (kin, 96)), dt)

        def mm_step(ain, kk=min(kin, 96)):
            y = jax.lax.dot_general(
                ain, w, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            fb = jnp.mean(y, axis=-1, keepdims=True) * 1e-6
            return ain.at[:, :1].add(fb.astype(dt))

        tm = timed_chain(mm_step, a, n1=100, n2=3000)
        print(f"matmul ({rows}x{kin})x({kin}x96): {tm*1e6:.1f} us "
              f"({rows*kin*96*2/tm/1e12:.1f} TF/s)")

    # big matmul sanity roof
    a = jnp.asarray(rng.random((4096, 4096)), dt)
    w = jnp.asarray(rng.normal(0, 0.02, (4096, 4096)), dt)

    def big_step(ain):
        return (ain @ w) * 1e-3

    tb = timed_chain(big_step, a, n1=20, n2=300)
    print(f"4096^3 matmul: {tb*1e3:.2f} ms ({2*4096**3/tb/1e12:.1f} TF/s)")


if __name__ == "__main__":
    main()
