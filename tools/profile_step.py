#!/usr/bin/env python
"""On-chip attribution of the train step (VERDICT r3 item 3).

Captures a jax.profiler trace of N full optimizer steps at the reference
train config (8x7x144x144, bf16) and aggregates device-op wall time from
the chrome-trace JSON, grouping ops into the buckets PERF.md names:
fused chain kernels, conv5-head adjoint, frequency analyzer, nonlocal
aggs, GMM tail/sample, BD degrade, Adam/clip/guard, everything else.

Falls back with a clear message if the axon runtime does not emit device
tracks (profiler support on the tunneled chip is not guaranteed).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_step.py
       [--steps 3] [--out /tmp/jax_trace]
"""

import argparse
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from tools.bench_train import SHAPE, build_model


def build_from_yaml(cfg_path: str):
    """Build the EXACT trainer model (same HLO => warm persistent-cache
    hit; a config-variant model pays a fresh ~10 min tunnel compile)."""
    from selfc_tpu.config import parse

    opt = parse(cfg_path, is_train=True)
    from selfc_tpu.train.rescale_model import RescaleModel

    return RescaleModel(opt)


def capture(model, out_dir: str, steps: int):
    hr = jnp.asarray(np.random.default_rng(0).random(SHAPE), jnp.float32)
    p, s = model.params, model.opt_state
    step_fn = model._jit_train_step
    # warm-up/compile outside the trace
    p2, s2, log = step_fn(p, s, hr, jnp.float32(2e-4), jnp.int32(0))
    np.asarray(log)
    with jax.profiler.trace(out_dir):
        for i in range(steps):
            p2, s2, log = step_fn(p2, s2, hr, jnp.float32(2e-4),
                                  jnp.int32(i + 1))
        np.asarray(log)  # force completion inside the trace window


BUCKETS = [
    # (bucket, substrings matched against the op/kernel name, lowercased)
    ("chain fwd kernel", ["chain_v2", "chain_fwd", "fused_dense"]),
    ("chain bwd kernel", ["chain_bwd", "_bwd_kernel"]),
    ("hg pair kernel", ["hg_pair", "_hg_"]),
    ("deform", ["deform"]),
    # collective bucket must come BEFORE the generic "fusion" match, or
    # fusion.clone collectives get misattributed to elementwise (ADVICE r4)
    ("allreduce/collective", ["all-reduce", "collective", "fusion.clone"]),
    ("fusion/elementwise", ["fusion"]),
    ("convolution (xla)", ["conv", "cudnn"]),
    ("dot/matmul (xla)", ["dot", "gemm", "matmul", "einsum"]),
    ("reduce", ["reduce"]),
    ("copy/transpose/reshape", ["copy", "transpose", "reshape", "bitcast",
                                "concatenate", "slice", "pad", "gather",
                                "scatter", "select", "dynamic"]),
    ("rng", ["rng", "threefry", "philox"]),
]


def bucket_of(name: str) -> str:
    low = name.lower()
    for bucket, keys in BUCKETS:
        if any(k in low for k in keys):
            return bucket
    return "other"


def parse_trace(out_dir: str, top_n: int = 40):
    paths = sorted(
        glob.glob(os.path.join(out_dir, "**", "*.trace.json.gz"),
                  recursive=True),
        key=os.path.getmtime,
    )
    if not paths:
        print("NO trace.json.gz produced — profiler unsupported here?")
        return False
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # device tracks: pid whose process_name metadata mentions TPU / device
    proc_names = {}
    for ev in events:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            proc_names[ev["pid"]] = ev.get("args", {}).get("name", "")
    device_pids = {
        pid for pid, name in proc_names.items()
        if any(k in name.lower() for k in ("tpu", "device", "xla", "/device"))
        and "host" not in name.lower()
    }
    print("process tracks:", sorted(proc_names.values()))
    per_op = defaultdict(float)
    per_op_n = defaultdict(int)
    total = 0.0
    for ev in events:
        if ev.get("ph") != "X" or "dur" not in ev:
            continue
        if device_pids and ev.get("pid") not in device_pids:
            continue
        name = ev.get("name", "?")
        per_op[name] += ev["dur"]
        per_op_n[name] += 1
        total += ev["dur"]
    if not per_op:
        print("no complete (ph=X) events on device tracks")
        return False
    per_bucket = defaultdict(float)
    for name, dur in per_op.items():
        per_bucket[bucket_of(name)] += dur
    print(f"\n== total device-op time: {total / 1e3:.2f} ms "
          f"(all traced steps) ==")
    print("\n-- by bucket --")
    for b, dur in sorted(per_bucket.items(), key=lambda kv: -kv[1]):
        print(f"{dur / 1e3:9.2f} ms  {100 * dur / total:5.1f}%  {b}")
    print(f"\n-- top {top_n} ops --")
    rows = sorted(per_op.items(), key=lambda kv: -kv[1])[:top_n]
    for name, dur in rows:
        print(f"{dur / 1e3:9.2f} ms  x{per_op_n[name]:<5d} {name[:110]}")
    return True


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--out", default="/tmp/jax_trace")
    ap.add_argument("--parse-only", action="store_true")
    ap.add_argument("--fp32", action="store_true")
    ap.add_argument(
        "--config", default=None,
        help="trainer YAML; reuses its exact jitted step (warm cache)",
    )
    args = ap.parse_args()

    if not args.parse_only:
        if args.config:
            model = build_from_yaml(args.config)
        else:
            model = build_model(remat=False, mixed_precision=not args.fp32)
        t0 = time.perf_counter()
        capture(model, args.out, args.steps)
        print(f"capture done in {time.perf_counter() - t0:.1f}s "
              f"({args.steps} steps)")
    parse_trace(args.out)


if __name__ == "__main__":
    main()
