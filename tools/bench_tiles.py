#!/usr/bin/env python
"""Chip sweep: v2 chain kernel row-tile size (SELFC_TPU_TILE_H)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from selfc_tpu.ops.pallas_chain import _pallas_impl_v2
from tools.bench_v3 import timed


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
        res = []
        for th in ("24", "48", "16", "36"):
            os.environ["SELFC_TPU_TILE_H"] = th
            try:
                t = timed(_pallas_impl_v2, args)
                res.append(f"TH{th}: {t*1e3:7.3f} ms")
            except Exception as e:  # noqa: BLE001
                res.append(f"TH{th}: fail({type(e).__name__})")
        os.environ.pop("SELFC_TPU_TILE_H", None)
        print(f"{name:14s} " + "  ".join(res))


if __name__ == "__main__":
    main()
