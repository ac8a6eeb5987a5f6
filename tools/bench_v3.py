#!/usr/bin/env python
"""Chip microbench + correctness: chain kernel v2 vs v3 on the flagship
coupling-block chain shapes."""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from selfc_tpu.ops.pallas_chain import (
    _pallas_impl_v2,
    _pallas_impl_v3,
    _pick_pack_depth,
    _round_up,
)


def timed(fn, args, n1=6, n2=18, reps=3):
    @partial(jax.jit, static_argnums=(1,))
    def chain(x, n):
        def body(i, x):
            y = fn(x, *args[1:])
            # keep shapes closed with a real (non-DCE-able) data dependency
            return x + jnp.mean(y).astype(x.dtype) * jnp.asarray(
                1e-12, x.dtype
            )
        out = jax.lax.fori_loop(0, n, body, x)
        return jnp.sum(out[..., 0, 0, :].astype(jnp.float32))

    x0 = args[0]
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
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    shapes = [
        ("H/G (3->48)", (1, 7, 144, 176, 3), 48),
        ("F   (48->3)", (1, 7, 144, 176, 48), 3),
        ("STP (64->64)", (1, 7, 144, 176, 64), 64),
    ]
    for name, shape, c_out in shapes:
        C = shape[-1]
        ws = tuple(
            jnp.asarray(rng.normal(0, 0.1, (3, 3, C + 32 * i, 32)), dt)
            for i in range(4)
        )
        bs = tuple(
            jnp.asarray(rng.normal(0, 0.1, (32,)), jnp.float32)
            for _ in range(4)
        )
        w5 = jnp.asarray(rng.normal(0, 0.1, (3, C + 128, c_out)), dt)
        b5 = jnp.asarray(rng.normal(0, 0.1, (c_out,)), jnp.float32)
        x = jnp.asarray(rng.normal(0, 1, shape), dt)
        args = (x, ws, bs, w5, b5)

        y2 = np.asarray(_pallas_impl_v2(*args), np.float32)
        y3 = np.asarray(_pallas_impl_v3(*args), np.float32)
        err = np.max(np.abs(y2 - y3))
        t2 = timed(_pallas_impl_v2, args)
        t3 = timed(_pallas_impl_v3, args)
        X = _round_up(C, 32)
        print(
            f"{name:14s} P={_pick_pack_depth(X)}  v2 {t2*1e3:7.3f} ms  "
            f"v3 {t3*1e3:7.3f} ms  ({t2/t3:4.2f}x)  maxdiff {err:.2e}"
        )


if __name__ == "__main__":
    main()
