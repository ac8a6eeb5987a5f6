#!/usr/bin/env python
"""Honest codec streaming-eval throughput at the UVG headline shape.

Drives CodecModel.test() — the full reference streaming protocol
(SelfC_Codec_arch_inv.forward_test:502-640): GOP segmentation Seg_Len=3,
width-halved encode tiling, live codec stream + bpp, 2x2 decode tiling —
at 1080p, T=100 (the reference's UVG eval workload,
test_codec_uvg_zerolatency.yml). The pipeline is host-orchestrated and
every segment's latents/HR land in host numpy (np.asarray forces real
device->host transfer), so wall-clock IS honest on axon — no
block_until_ready involvement.

The codec span is the REAL libx265 stream via the native selfc_x265
bridge when available (rate provenance stamped on the output line), and
the NullCodec 8-bit stand-in otherwise.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_codec_eval.py
       [--frames 100] [--height 1080] [--width 1920] [--reps 2]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=100)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--mode", default="batched",
                    choices=["serial", "batched"],
                    help="serial = the reference call pattern (one device "
                         "call per tile, no host/device overlap); batched = "
                         "tiles ride the batch axis + overlapped readback")
    ap.add_argument("--seg-batch", type=int, default=4,
                    help="segments folded per device call (batched mode; "
                         "4 = the CodecModel default)")
    args = ap.parse_args()

    import jax

    from selfc_tpu.config import dict_to_nonedict
    from selfc_tpu.train.codec_model import CodecModel

    opt = dict_to_nonedict({
        "is_train": False, "model": "SelfC_GMM_Codec", "distortion": "sr_bd",
        "scale": 2,
        "datasets": {},
        "network_G": dict(
            which_model_G={"subnet_type": "D2DTNet"},
            in_nc=3, out_nc=3, block_num=[4], init="xavier",
            scale=2, stp_blk_num=4, stp_hidden_c=24,
            stp_denseblock_innerc=12, fh_loss="l2",
            h265_q=9, h265_keyint=12, h265_all_default=True,
        ),
        "path": {},
        "train": None,
        "val": {
            "batch_tiles": args.mode == "batched",
            "seg_batch": args.seg_batch,
            "overlap": args.mode == "batched",
        },
    })
    print(f"backend: {jax.default_backend()}", file=sys.stderr)
    model = CodecModel(opt)
    T, H, W = args.frames, args.height, args.width
    rng = np.random.default_rng(0)
    # band-limited-ish content (pure noise is unrepresentative but the
    # device FLOPs are shape-only; content changes nothing in timing)
    clip = rng.random((1, T, H, W, 3)).astype(np.float32)
    model.feed_data({"GT": clip})

    times = []
    for r in range(args.reps):
        t0 = time.perf_counter()
        model.test()
        dt = time.perf_counter() - t0
        times.append(dt)
        print(f"rep {r}: {dt:.2f}s ({T / dt:.2f} frames/s)"
              + ("  [includes jit compile]" if r == 0 else ""),
              file=sys.stderr)
    best = min(times[1:]) if len(times) > 1 else times[0]
    print(
        f"codec streaming eval {H}x{W} T={T}: {best:.2f}s"
        f" = {T / best:.2f} frames/s/chip (video_bpp={model.video_bpp:.4f})"
        f" [rate: {model.rate_source}]"
    )


if __name__ == "__main__":
    main()
