#!/usr/bin/env python
"""Host data-loader throughput at the reference train config
(batch 8, T=7, GT 144 crops — train_rescaling_selfc_large.yml:96-120).

Generates a synthetic LQGTVID PNG tree (if absent), then measures
sustained batches/s for the thread-pool loader and the process-based
loader at several worker counts. Compare against the device step time
from tools/bench_train.py: the loader "keeps up" when
  batches/s >= 1 / (train step seconds).

Usage: PYTHONPATH=/root/repo python tools/bench_loader.py [--root DIR]
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from selfc_tpu.config import dict_to_nonedict  # noqa: E402
from selfc_tpu.data import util as data_util  # noqa: E402
from selfc_tpu.data.loader import create_dataloader, create_dataset  # noqa: E402
from selfc_tpu.data.sampler import DistIterSampler  # noqa: E402

BATCH = 8
T = 7
GT_SIZE = 144


def ensure_data(root: str):
    if os.path.exists(os.path.join(root, "list.txt")):
        return
    here = os.path.dirname(os.path.abspath(__file__))
    subprocess.run(
        [sys.executable, os.path.join(here, "make_synth_data.py"),
         "--root", root, "--clips", "48", "--frames", "10",
         "--height", "160", "--width", "160"],
        check=True,
    )


def ensure_packed(root: str, out: str):
    if os.path.exists(os.path.join(out, "index.json")):
        return
    from selfc_tpu.data.packed import pack_lqgtvid

    pack_lqgtvid(root, os.path.join(root, "list.txt"), out)


def measure(root: str, use_proc: bool, n_workers: int, n_cold: int = 6,
            n_steady: int = 30, mode: str = "LQGTVID", u8: bool = False):
    """(cold batches/s, steady batches/s).

    Mirrors train.py: one ratio-200 DistIterSampler epoch, so workers
    persist across the whole measurement and the bounded decode cache
    warms exactly as it does in real training. Cold = the first epoch-
    equivalent of batches (every PNG decoded fresh); steady = the
    cache-warm regime the ratio-200 sampler spends >99% of its time in.
    """
    data_util._DECODE_CACHE.clear()
    data_util._DECODE_CACHE_BYTES = 0
    ds_opt = dict_to_nonedict({
        "phase": "train", "mode": mode,
        "dataroot_GT": root, "dataroot_list": os.path.join(root, "list.txt"),
        "video_len": T, "GT_size": GT_SIZE, "batch_size": BATCH,
        "use_flip": True, "use_rot": True, "use_shuffle": True,
        "n_workers": n_workers, "gpu_ids": [0],
        "use_process_loader": use_proc, "output_uint8": u8,
    })
    ds = create_dataset(ds_opt)
    sampler = DistIterSampler(len(ds), 1, 0, ratio=200)
    loader = create_dataloader(ds, ds_opt, {"world_size": 1}, sampler)
    it = iter(loader)
    next(it)  # exclude worker spawn + first decode wave

    def run(n):
        t0 = time.perf_counter()
        for _ in range(n):
            batch = next(it)
            assert batch["GT"].shape == (BATCH, T, GT_SIZE, GT_SIZE, 3)
        return n / (time.perf_counter() - t0)

    cold = run(n_cold - 1)
    run(n_cold)  # let the cache finish warming before the steady window
    steady = run(n_steady)
    it.close()
    if hasattr(loader, "close"):
        loader.close()
    return cold, steady


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/synth_loader")
    ap.add_argument("--step-ms", type=float, default=None,
                    help="device train-step ms (from bench_train) to "
                         "report keeps-up verdicts against")
    args = ap.parse_args()
    ensure_data(args.root)

    packed_root = args.root.rstrip("/") + "_packed"
    ensure_packed(args.root, packed_root)

    cases = [
        ("thread    ", args.root, False, "LQGTVID", (2, 4), False),
        ("process   ", args.root, True, "LQGTVID", (2, 4), False),
        ("packed    ", packed_root, False, "LQGTVID_packed", (1, 2), False),
        ("packed+p  ", packed_root, True, "LQGTVID_packed", (1, 2), False),
        ("packed-u8 ", packed_root, False, "LQGTVID_packed", (1, 2), True),
        ("packed-u8p", packed_root, True, "LQGTVID_packed", (1, 2), True),
    ]
    for kind, root, use_proc, mode, worker_counts, u8 in cases:
        for n_workers in worker_counts:
            cold, steady = measure(root, use_proc, n_workers, mode=mode,
                                   u8=u8)
            line = (f"{kind} workers={n_workers}  "
                    f"cold {cold:5.2f} b/s  steady {steady:6.2f} b/s "
                    f"({steady * BATCH * T:7.1f} frames/s)")
            if args.step_ms:
                need = 1000.0 / args.step_ms
                line += f"  [device needs {need:.2f}/s: " + (
                    "KEEPS UP" if steady >= need else "falls behind") + "]"
            print(line)


if __name__ == "__main__":
    main()
