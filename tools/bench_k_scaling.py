#!/usr/bin/env python
"""Does a VMEM-resident MXU dot's cost scale with K below 128?

Times a Pallas kernel that runs R back-to-back dots of (M, K) @ (K, N)
fp32-accumulated bf16 operands, for K in {32, 64, 96, 128, 256} at the
chain kernel's flagship shape (M = 36*176 rows, N = 96 lanes). If time is
flat below K=128, the dense chain's early convs (K=32/64) waste MXU
passes and K-packing them would pay; if it scales ~linearly, they don't.
"""

import sys
import os
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M, N, R = 36 * 176, 96, 64


def make_fn(K):
    def kernel(x_ref, w_ref, o_ref):
        acc = None
        for r in range(R):
            d = jax.lax.dot_general(
                x_ref[...], w_ref[r],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = d if acc is None else acc + d
        o_ref[...] = acc.astype(o_ref.dtype)

    @jax.jit
    def fn(x, w):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((M, N), jnp.bfloat16),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x, w)

    return fn


def timed(fn, x, w, K, n1=20, n2=120, reps=3):
    @partial(jax.jit, static_argnums=(2,))
    def chain(x, w, n):
        def body(i, x):
            y = fn(x, w)
            # scalar feedback: data dependence at negligible cost.
            # (1e-12 scale: not foldable, numerically harmless in bf16)
            return x + (y[0, 0] * 1e-12).astype(x.dtype)
        out = jax.lax.fori_loop(0, n, body, x)
        return jnp.sum(out[0].astype(jnp.float32))

    float(chain(x, w, n1)); float(chain(x, w, n2))

    def run(n):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(chain(x, w, n))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    return (run(n2) - run(n1)) / (n2 - n1)


def main():
    rng = np.random.default_rng(0)
    for K in (32, 64, 96, 128, 256):
        w = jnp.asarray(rng.normal(0, 1, (R, K, N)), jnp.bfloat16)
        xk = jnp.asarray(rng.normal(0, 1, (M, K)), jnp.bfloat16)
        dt = timed(make_fn(K), xk, w, K) / R
        fl = 2 * M * K * N
        print(f"K={K:4d}  {dt * 1e6:8.2f} us/dot   "
              f"{fl / dt / 1e12:6.1f} TF/s")


if __name__ == "__main__":
    main()
