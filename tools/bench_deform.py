#!/usr/bin/env python
"""Bench the three deform_conv2d lowerings at the STP latent shape.

  exact-xla   bilinear gather + 9 dots as an XLA gather composition
  pallas      ops/deform.py:deform_conv2d_pallas — the fused VMEM-resident
              gather kernel (SURVEY §2.4's named kernel)
  windowed    gather-free bounded-displacement expansion (radius 3)

Timing uses the same chained-slope method as bench.py (block_until_ready
does not block on axon; chain N data-dependent calls in one jit, time the
slope between two chain lengths).

  PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_deform.py
"""

from __future__ import annotations

import argparse
import sys
import time
from functools import partial

import numpy as np


def timed_chain(fn_step, x0, n1=2, n2=8, reps=3):
    import jax
    import jax.numpy as jnp

    @partial(jax.jit, static_argnums=(1,))
    def chain(x, n):
        def body(i, x):
            return fn_step(x)
        out = jax.lax.fori_loop(0, n, body, x)
        return jnp.sum(out[..., 0, :].astype(jnp.float32))

    float(chain(x0, n1))
    float(chain(x0, n2))

    def run(n):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(chain(x0, n))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    return (run(n2) - run(n1)) / (n2 - n1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=7)
    ap.add_argument("--height", type=int, default=144)
    ap.add_argument("--width", type=int, default=176)
    ap.add_argument("--channels", type=int, default=64)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--radius", type=int, default=3)
    ap.add_argument("--variants", default="exact-xla,pallas,windowed")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from selfc_tpu.ops import deform as D

    B, H, W, C = args.batch, args.height, args.width, args.channels
    dt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((B, H, W, C)), dt)
    # offsets within +-4 px — representative of a trained offset head
    off = jnp.asarray(rng.uniform(-4, 4, (B, H, W, 18)), dt)
    msk = jnp.asarray(rng.uniform(0, 1, (B, H, W, 9)), dt)
    wgt = jnp.asarray(rng.standard_normal((3, 3, C, C)) * 0.05, dt)

    print(f"backend: {jax.default_backend()}  shape: {B}x{H}x{W}x{C} "
          f"{args.dtype}", file=sys.stderr)

    fns = {
        "exact-xla": lambda x: D.deform_conv2d(x, off, msk, wgt),
        "pallas": lambda x: D.deform_conv2d_pallas(x, off, msk, wgt),
        "windowed": lambda x: D.deform_conv2d_windowed(
            x, off, msk, wgt, radius=args.radius),
    }
    for name in args.variants.split(","):
        fn = fns[name]
        sec = timed_chain(lambda x: fn(x).astype(dt), x0)
        print(f"{name:10s} {sec * 1e3:8.2f} ms/call")


if __name__ == "__main__":
    main()
