#!/usr/bin/env python
"""Honest train-step timing at the reference rescaling config
(batch 8, T=7, GT 144 — train_rescaling_selfc_large.yml:96-120).

Chains N full optimizer steps (params/opt_state carried through a
fori_loop, same batch re-fed) and reads back a scalar; sec/step is the
slope between two chain lengths, cancelling dispatch/readback latency.
Reports remat off / remat on so the remat flag's real cost is on record
(VERDICT round-1 weak #3; remat is now whole-roundtrip jax.checkpoint at
the train-step level — the per-block nn.remat was pathological).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_train.py
       [--remat-only] [--no-remat]
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

from selfc_tpu.config import dict_to_nonedict
from selfc_tpu.train.rescale_model import RescaleModel

SHAPE = (8, 7, 144, 144, 3)


def build_model(remat: bool, mixed_precision: bool = False):
    opt = dict_to_nonedict({
        "is_train": True, "model": "SelfC_GMM", "distortion": "sr_bd",
        "scale": 4,
        "datasets": {"train": {"video_len": SHAPE[1], "GT_size": SHAPE[2]}},
        "network_G": {
            "which_model_G": {"subnet_type": "D2DTNet"},
            "in_nc": 3, "out_nc": 3, "block_num": [4, 4], "scale": 4,
            "init": "xavier", "global_module": "nonlocal", "stp_blk_num": 6,
            "fh_loss": "gmm", "gmm_k": 5, "remat": remat,
        },
        "path": {},
        "train": {
            "mixed_precision": mixed_precision,
            "lr_G": 2e-4, "beta1": 0.9, "beta2": 0.999,
            "lr_scheme": "MultiStepLR", "lr_steps": [], "lr_gamma": 0.5,
            "pixel_criterion_forw": "l2", "pixel_criterion_back": "l1",
            "lambda_fit_forw": 4.0, "lambda_rec_back": 1.0,
            "gradient_clipping": 10.0,
        },
    })
    return RescaleModel(opt)


def time_steps(model, n1=2, n2=6, reps=3):
    hr = jnp.asarray(np.random.default_rng(0).random(SHAPE), jnp.float32)

    @partial(jax.jit, static_argnums=(2,))
    def chain(params, opt_state, n):
        def body(i, carry):
            params, opt_state = carry
            params, opt_state, _ = model._train_step(
                params, opt_state, hr, jnp.float32(2e-4),
                i.astype(jnp.int32),
            )
            return params, opt_state

        params, opt_state = jax.lax.fori_loop(
            0, n, body, (params, opt_state)
        )
        leaf = jax.tree_util.tree_leaves(params)[0]
        return jnp.sum(leaf.astype(jnp.float32))

    p, s = model.params, model.opt_state
    t0 = time.perf_counter()
    float(chain(p, s, n1))
    compile_s = time.perf_counter() - t0
    float(chain(p, s, n2))

    def run(n):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(chain(p, s, n))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    dt = (run(n2) - run(n1)) / (n2 - n1)
    return dt, compile_s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--remat-only", action="store_true")
    ap.add_argument("--no-remat", action="store_true")
    ap.add_argument("--mp", action="store_true",
                    help="also measure train.mixed_precision (bf16)")
    args = ap.parse_args()
    modes = [False, True]
    if args.remat_only:
        modes = [True]
    if args.no_remat:
        modes = [False]
    frames = SHAPE[0] * SHAPE[1]
    precisions = [False, True] if args.mp else [False]
    for remat in modes:
        for mp in precisions:
            try:
                model = build_model(remat, mp)
                dt, compile_s = time_steps(model)
            except Exception as e:  # noqa: BLE001 - OOM configs get a line
                print(f"remat={remat!s:5} bf16={mp!s:5}  "
                      f"FAILED ({type(e).__name__}: {str(e)[:80]})")
                continue
            print(
                f"remat={remat!s:5} bf16={mp!s:5}  {dt * 1e3:8.2f} ms/step  "
                f"({1 / dt:6.2f} steps/s, {frames / dt:7.1f} frames/s)  "
                f"[first-call {compile_s:.0f}s]"
            )


if __name__ == "__main__":
    main()
