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
    ap.add_argument(
        "--ablate", action="store_true",
        help="attribute the step-time gap above the chain-dot floor "
        "(PERF.md 'Launch-bound floor'): adam-only, encode-side-only "
        "grad, and a no-nonlocal-aggs model variant",
    )
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

    rows = [
        ("loss fwd only", loss_only, p0),
        ("loss + grad  ", grad_only, p0),
        ("full opt step", full_step, (p0, model.opt_state)),
    ]

    if args.ablate:
        from selfc_tpu.train.losses import reconstruction_loss

        x_in = hr.astype(jnp.bfloat16) if args.mp else hr
        ref_l = jax.lax.stop_gradient(model.degrade(hr))

        def enc_loss(q):
            y, _ = model.net.apply(
                {"params": q}, x_in, method=model.net.encode
            )
            return (
                reconstruction_loss(
                    y[..., :3].astype(jnp.float32), ref_l, "l2"
                ) * 144 * 144 * 3
            )

        def enc_grad_only(p):
            g = jax.grad(enc_loss)(p)
            return jax.tree.map(
                lambda a, b: a - 1e-12 * b.astype(a.dtype), p, g
            )

        g0 = jax.tree.map(lambda a: jnp.full_like(a, 1e-6), p0)

        def adam_only(carry):
            p, s = carry
            updates, s = model.tx.update(g0, s, p)
            p = jax.tree.map(lambda a, u: a - 2e-4 * u, p, updates)
            return p, s

        rows += [
            ("encode-side loss+grad", enc_grad_only, p0),
            ("adam update only     ", adam_only, (p0, model.opt_state)),
        ]

    for name, fn, c0 in rows:
        dt, flops = timed_scalar_chain(fn, c0)
        tf = f"  {flops / dt / 1e12:6.1f} TF/s" if flops else ""
        fl = f"  {flops / 1e12:6.2f} TFLOP" if flops else ""
        print(f"{name}  {dt * 1e3:8.2f} ms{fl}{tf}")

    if args.ablate:
        # second model: nonlocal aggregations removed — the grad-time
        # delta vs the base model is the 6 aggs' fwd+bwd share
        def build_noagg(remat, mixed_precision=False):
            from selfc_tpu.config import dict_to_nonedict
            from selfc_tpu.train.rescale_model import RescaleModel

            opt = dict_to_nonedict({
                "is_train": True, "model": "SelfC_GMM",
                "distortion": "sr_bd", "scale": 4,
                "datasets": {"train": {"video_len": SHAPE[1],
                                       "GT_size": SHAPE[2]}},
                "network_G": {
                    "which_model_G": {"subnet_type": "D2DTNet"},
                    "in_nc": 3, "out_nc": 3, "block_num": [4, 4],
                    "scale": 4, "init": "xavier",
                    "global_module": "nolocal", "stp_blk_num": 6,
                    "fh_loss": "gmm", "gmm_k": 5, "remat": remat,
                },
                "path": {},
                "train": {
                    "mixed_precision": mixed_precision,
                    "lr_G": 2e-4, "beta1": 0.9, "beta2": 0.999,
                    "lr_scheme": "MultiStepLR", "lr_steps": [],
                    "lr_gamma": 0.5,
                    "pixel_criterion_forw": "l2",
                    "pixel_criterion_back": "l1",
                    "lambda_fit_forw": 4.0, "lambda_rec_back": 1.0,
                    "gradient_clipping": 10.0,
                },
            })
            return RescaleModel(opt)

        m2 = build_noagg(remat=args.remat, mixed_precision=args.mp)
        rng2 = jax.random.PRNGKey(0)

        def grad_noagg(p):
            ref_l = jax.lax.stop_gradient(m2.degrade(hr))
            g = jax.grad(lambda q: m2._loss(q, hr, ref_l, rng2)[0])(p)
            return jax.tree.map(
                lambda a, b: a - 1e-12 * b.astype(a.dtype), p, g
            )

        dt, flops = timed_scalar_chain(grad_noagg, m2.params)
        tf = f"  {flops / dt / 1e12:6.1f} TF/s" if flops else ""
        fl = f"  {flops / 1e12:6.2f} TFLOP" if flops else ""
        print(f"loss+grad, no aggs    {dt * 1e3:8.2f} ms{fl}{tf}")


if __name__ == "__main__":
    main()
