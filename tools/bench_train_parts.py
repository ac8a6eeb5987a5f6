#!/usr/bin/env python
"""Decompose the train step: loss fwd alone vs value_and_grad vs full
optimizer step, at the reference train config (8,7,144,144,3), with
XLA cost-model FLOPs for an MFU estimate.

Usage: python tools/bench_train_parts.py [--mp]
"""

import argparse
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from tools.bench_train import SHAPE, build_model


def timed_scalar_chain(fn, carry0, n1=2, n2=6, reps=3):
    """fn: carry -> carry (pytree). Chain n steps, read back one scalar."""

    @partial(jax.jit, static_argnums=(1,))
    def chain(carry, n):
        carry = jax.lax.fori_loop(0, n, lambda i, c: fn(c), carry)
        leaf = jax.tree_util.tree_leaves(carry)[0]
        return jnp.sum(leaf.astype(jnp.float32))

    float(chain(carry0, n1))
    float(chain(carry0, n2))

    def run(n):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(chain(carry0, n))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    dt = (run(n2) - run(n1)) / (n2 - n1)

    flops = None
    try:
        ca = (
            jax.jit(lambda c: fn(c)).lower(carry0).compile().cost_analysis()
        )
        if isinstance(ca, list):
            ca = ca[0]
        flops = ca.get("flops")
    except Exception:
        pass
    return dt, flops


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mp", action="store_true")
    ap.add_argument("--remat", action="store_true")
    args = ap.parse_args()

    model = build_model(remat=args.remat, mixed_precision=args.mp)
    hr = jnp.asarray(np.random.default_rng(0).random(SHAPE), jnp.float32)
    p0 = model.params
    rng = jax.random.PRNGKey(0)

    def loss_only(p):
        ref_l = jax.lax.stop_gradient(model.degrade(hr))
        loss, _ = model._loss(p, hr, ref_l, rng)
        return jax.tree.map(
            lambda a: a + 1e-12 * loss.astype(a.dtype), p
        )

    def grad_only(p):
        ref_l = jax.lax.stop_gradient(model.degrade(hr))
        g = jax.grad(lambda q: model._loss(q, hr, ref_l, rng)[0])(p)
        return jax.tree.map(lambda a, b: a - 1e-12 * b.astype(a.dtype), p, g)

    def full_step(carry):
        p, s = carry
        p, s, _ = model._train_step(p, s, hr, jnp.float32(2e-4), jnp.int32(0))
        return p, s

    for name, fn, c0 in (
        ("loss fwd only", loss_only, p0),
        ("loss + grad  ", grad_only, p0),
        ("full opt step", full_step, (p0, model.opt_state)),
    ):
        dt, flops = timed_scalar_chain(fn, c0)
        tf = f"  {flops / dt / 1e12:6.1f} TF/s" if flops else ""
        fl = f"  {flops / 1e12:6.2f} TFLOP" if flops else ""
        print(f"{name}  {dt * 1e3:8.2f} ms{fl}{tf}")


if __name__ == "__main__":
    main()
