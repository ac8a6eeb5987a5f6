#!/usr/bin/env python
"""Per-component honest timing of the flagship roundtrip on the chip.

Uses the same chained data-dependent slope method as bench.py. Each
component is timed as a self-composable step (output feeds back into the
next iteration) so no fake parallelism can hide work.
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from selfc_tpu.models.inv_nets import SelfCNetGMM
from selfc_tpu.ops.freq import freq_forward, freq_inverse
from selfc_tpu.ops.quantize import quantize_ste

SHAPE = (1, 7, 576, 704, 3)


def timed_chain(fn_step, x0, n1=4, n2=12, reps=3):
    @partial(jax.jit, static_argnums=(1,))
    def chain(x, n):
        def body(i, x):
            return fn_step(x)
        out = jax.lax.fori_loop(0, n, body, x)
        leaf = jax.tree_util.tree_leaves(out)[0]
        return jnp.sum(leaf[(0,) * (leaf.ndim - 1)].astype(jnp.float32))

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
    dtype = jnp.bfloat16
    net = SelfCNetGMM()
    x = jnp.asarray(np.random.default_rng(0).random(SHAPE), dtype)
    variables = net.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        x[:, :, :96, :96].astype(jnp.float32), method=net.roundtrip,
    )
    params = jax.tree.map(lambda a: a.astype(dtype), variables["params"])
    key = jax.random.PRNGKey(2)

    lat = freq_forward(x, 4)
    lr = lat[..., :3]

    def enc(xin):
        y, _ = net.apply({"params": params}, xin, method=net.encode)
        return jnp.clip(freq_inverse(y, 4), 0, 1)  # back to HR shape to chain

    def enc_only(yin):
        y, _ = net.apply(
            {"params": params}, freq_inverse(yin, 4), method=net.encode
        )
        return y

    def stp(lrin):
        p = net.apply({"params": params}, lrin, method=net.prior_params)
        # collapse params back to 3ch to chain
        return jnp.clip(lrin + 0.0 * p[..., :3], 0, 1)

    def stp_backbone(lrin):
        b = net.apply(
            {"params": params}, lrin,
            method=lambda m, v: m.stp_net.backbone(v),
        )
        return jnp.clip(lrin + 0.0 * b[..., :3], 0, 1)

    feat = jnp.asarray(
        np.random.default_rng(3).random(lr.shape[:-1] + (64,)), dtype
    )

    def stp_tail_sample(fin):  # 64ch features -> GMM params -> sample
        from selfc_tpu.ops.gmm import gmm_sample, split_params

        p = net.apply(
            {"params": params}, fin, method=lambda m, v: m.stp_net.tail(v)
        )
        hf = gmm_sample(split_params(p, 48, 5), key)
        pad = [(0, 0)] * (fin.ndim - 1) + [(0, fin.shape[-1] - hf.shape[-1])]
        return fin + 1e-6 * jnp.pad(hf, pad)

    def dec(lrin):
        hr, _ = net.apply(
            {"params": params}, lrin, method=net.decode,
            rngs={"sample": key},
        )
        return jnp.clip(freq_forward(hr, 4)[..., :3], 0, 1)

    def freq_rt(xin):
        return freq_inverse(freq_forward(xin, 4), 4)

    def quant(xin):
        return quantize_ste(xin)

    def full(xin):
        out = net.apply(
            {"params": params}, xin, method=net.roundtrip,
            rngs={"sample": key},
        )
        return jnp.clip(out["hr"], 0, 1)

    for name, fn, x0 in [
        ("full roundtrip", full, x),
        ("encode (8 blocks fwd, incl freq rt)", enc, x),
        ("stp prior only", stp, lr),
        ("stp backbone (chains+aggs)", stp_backbone, lr),
        ("stp tail MLP + gmm sample", stp_tail_sample, feat),
        ("decode (stp + sample + 8 blocks rev)", dec, lr),
        ("freq fwd+inv", freq_rt, x),
        ("quantize", quant, lr),
    ]:
        dt = timed_chain(fn, x0)
        print(f"{name:42s} {dt*1e3:8.2f} ms  ({7/dt:7.1f} fps)")


if __name__ == "__main__":
    main()
