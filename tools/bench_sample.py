#!/usr/bin/env python
"""Micro-bench: gmm_sample at the flagship decode shape, threefry vs rbg.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_sample.py
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from selfc_tpu.ops.gmm import gmm_sample, split_params

SHAPE = (1, 7, 144, 176, 48 * 5 * 3)  # flagship LR latent, hf=48 K=5


def timed(fn, x, key, n1=8, n2=24, reps=3):
    @partial(jax.jit, static_argnums=(2,))
    def chain(x, key, n):
        def body(i, carry):
            x, key = carry
            out = fn(x, jax.random.fold_in(key, i))
            # feed a scalar of the output back into the params so steps chain
            x = x + 1e-12 * jnp.mean(out).astype(x.dtype)
            return x, key

        x, _ = jax.lax.fori_loop(0, n, body, (x, key))
        return jnp.sum(x[..., 0, 0, :].astype(jnp.float32))

    float(chain(x, key, n1))
    float(chain(x, key, n2))

    def run(n):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(chain(x, key, n))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    return (run(n2) - run(n1)) / (n2 - n1)


def main():
    raw = jnp.asarray(
        np.random.default_rng(0).random(SHAPE), jnp.bfloat16
    )
    key = jax.random.PRNGKey(0)

    def sample(x, k):
        return gmm_sample(split_params(x, 48, 5), k)

    for flag in ("0", "1"):
        os.environ["SELFC_TPU_FAST_RNG"] = flag
        jax.clear_caches()
        dt = timed(sample, raw, key)
        name = "rbg" if flag == "1" else "threefry"
        print(f"gmm_sample [{name:8}]  {dt * 1e3:6.2f} ms")


if __name__ == "__main__":
    main()
