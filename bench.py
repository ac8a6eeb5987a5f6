#!/usr/bin/env python
"""Benchmark: frames/sec/chip for the flagship SelfC-GMM 4x rescaling
roundtrip (encode -> quantize -> prior-sample -> decode) at Vid4 'city'
resolution (1 x 7 x 576 x 704 x 3).

DEFAULT DTYPE IS float32 — the reference eval precision, i.e. the same
pipeline the parity evals run. bf16 serving mode (``--dtype bfloat16``,
val.eval_dtype in configs) is ~1.24x faster but costs a measured
0.23 dB Y-PSNR on a trained checkpoint (docs/PERF.md "Eval precision"),
so it is NOT the headline number.

Prints ONE JSON line:
  {"metric": ..., "value": fps, "unit": "frames/sec", "vs_baseline": x}

HONEST TIMING NOTE (round 2): ``jax.block_until_ready`` does NOT block on
the experimental axon platform — round-1 numbers timed with it were
invalid (they implied >10x the chip's peak FLOP/s). This bench instead
chains N data-dependent roundtrips inside ONE jit (each step's HR output
feeds the next step's input) and forces completion with a scalar readback;
the per-step time is the slope between two chain lengths, which also
cancels the ~30 ms tunnel dispatch/readback latency. Cross-checked against
a known-FLOPs 4096^3 bf16 matmul measured the same way (~108 TFLOP/s on a
v5e whose bf16 peak is ~197 — physically sane).

vs_baseline compares against the reference PyTorch implementation run on
CPU for the identical workload. Because the torch-CPU measurement is slow,
its result is cached in bench_baseline.json (regenerate with
``python bench.py --make-baseline``).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from functools import partial

import numpy as np

SHAPE = (1, 7, 576, 704, 3)  # B, T, H, W, C — Vid4 'city' at T=7
BASELINE_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "bench_baseline.json")


def timed_chain(fn_step, x0, n1=4, n2=12, reps=3):
    """sec/step for ``x -> fn_step(x)`` via the slope method.

    Chains n data-dependent steps inside one jit and reads back a scalar;
    (T(n2)-T(n1))/(n2-n1) removes the fixed dispatch+readback overhead.
    """
    import jax
    import jax.numpy as jnp

    @partial(jax.jit, static_argnums=(1,))
    def chain(x, n):
        def body(i, x):
            return fn_step(x)
        out = jax.lax.fori_loop(0, n, body, x)
        return jnp.sum(out[..., 0, 0, :].astype(jnp.float32))

    float(chain(x0, n1))  # compile + warmup
    float(chain(x0, n2))

    def run(n):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(chain(x0, n))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t1, t2 = run(n1), run(n2)
    return (t2 - t1) / (n2 - n1)


def bench_tpu(reps: int = 3, dtype_name: str = "float32") -> float:
    import jax
    import jax.numpy as jnp

    from selfc_tpu.models.inv_nets import SelfCNetGMM

    dtype = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32
    net = SelfCNetGMM()
    x = jnp.asarray(np.random.default_rng(0).random(SHAPE), dtype)
    variables = net.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        x[:, :, :96, :96].astype(jnp.float32), method=net.roundtrip,
    )
    params = variables["params"]
    key = jax.random.PRNGKey(2)

    def step(xin):
        # params are fp32 masters; cast once per step inside jit
        p = jax.tree.map(lambda a: a.astype(dtype), params)
        out = net.apply(
            {"params": p}, xin, method=net.roundtrip, rngs={"sample": key}
        )
        # clip keeps the fed-back video in-range across chained steps
        return jnp.clip(out["hr"], 0.0, 1.0)

    dt = timed_chain(step, x, reps=reps)
    frames = SHAPE[0] * SHAPE[1]
    return frames / dt


def bench_torch_cpu() -> float:
    """Reference implementation, torch CPU, same workload (fwd + rev)."""
    import types

    import torch

    ref = "/root/reference/codes"
    if not os.path.isdir(ref):
        raise RuntimeError("reference repo not available")
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tvo = types.ModuleType("torchvision.ops")
        tvo.deform_conv2d = lambda *a, **k: None
        tv.ops = tvo
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.ops"] = tvo
    for m in ("skvideo", "skvideo.io"):
        sys.modules.setdefault(m, types.ModuleType(m))
    sys.path.insert(0, ref)
    torch.cuda.FloatTensor = torch.FloatTensor

    import global_var

    global_var.GlobalVar.set_Temporal_LEN(SHAPE[1])
    global_var.GlobalVar.set_Istrain(True)
    from models.modules.SelfC_GMM_arch_inv import SelfCInvNet

    opt = {"global_module": "nonlocal", "stp_blk_num": 6, "fh_loss": "gmm",
           "scale": 4, "gmm_k": 5}
    net = SelfCInvNet(opt, 3, 3, "D2DTNet", [4, 4], 2).eval()
    B, T, H, W, C = SHAPE
    x = torch.rand(B * T, C, H, W)
    with torch.no_grad():
        t0 = time.perf_counter()
        y, _ = net(x, rev=False)
        lr = y[:, :3].clamp(0, 1)
        out, _ = net(lr, rev=True)
        dt = time.perf_counter() - t0
    return (B * T) / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--make-baseline", action="store_true")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--dtype", default="float32",
                    choices=["bfloat16", "float32"],
                    help="float32 = eval/parity grade (headline); "
                         "bfloat16 = serving mode (+24%% fps, -0.23 dB)")
    args = ap.parse_args()

    if args.make_baseline:
        fps = bench_torch_cpu()
        with open(BASELINE_FILE, "w") as f:
            json.dump({"torch_cpu_fps": fps, "shape": SHAPE}, f)
        print(json.dumps({"torch_cpu_fps": fps}))
        return

    fps = bench_tpu(args.reps, args.dtype)
    vs = None
    if os.path.exists(BASELINE_FILE):
        with open(BASELINE_FILE) as f:
            base = json.load(f)
        if base.get("torch_cpu_fps"):
            vs = fps / base["torch_cpu_fps"]
    print(json.dumps({
        "metric": "selfc_gmm_4x_rescale_roundtrip_fps_per_chip",
        "value": round(fps, 3),
        "unit": "frames/sec",
        "vs_baseline": round(vs, 3) if vs is not None else None,
        "dtype": args.dtype,
    }))


if __name__ == "__main__":
    main()
