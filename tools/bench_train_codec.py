#!/usr/bin/env python
"""Honest codec train-step timing at the reference compression config
(batch 12, T=3, GT 144, scale 2 — train_compression.yml:22-58).

The codec step is split around the host codec (encode-jit -> host x265 ->
loss/update-jit), so it cannot be chained inside one jit like the
rescaling bench. Honest timing here relies on the split itself: each
`optimize_parameters` call transfers the encoded LF to the HOST
(np.asarray — a real device round trip that cannot return early) and the
next step's encode depends on the updated params, so back-to-back calls
are serialized end to end. We time N calls wall-to-wall and subtract
nothing; the host-codec share is reported separately (ffmpeg absent ->
the zero-frame fallback makes the host share ~0, isolating device+
transfer cost; with a real x265 add its encode time).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_train_codec.py [--mp]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from selfc_tpu.config import dict_to_nonedict

SHAPE = (12, 3, 144, 144, 3)  # B, T, GT, GT, C — train_compression.yml


def build_model(mixed_precision: bool):
    from selfc_tpu.train.codec_model import CodecModel

    opt = dict_to_nonedict({
        "is_train": True, "model": "SelfC_GMM_Codec", "distortion": "sr_bd",
        "scale": 2,
        "datasets": {"train": {"video_len": SHAPE[1], "GT_size": SHAPE[2],
                               "batch_size": SHAPE[0]}},
        "network_G": {
            "which_model_G": {"subnet_type": "D2DTNet"},
            "in_nc": 3, "out_nc": 3, "block_num": [4], "scale": 2,
            "init": "xavier", "global_module": "nonlocal", "stp_blk_num": 4,
            "fh_loss": "l2", "h265_q": 16, "lambda_corr": 1e-5,
            "stp_hidden_c": 24, "stp_denseblock_innerc": 12,
        },
        "path": {},
        "train": {
            "mixed_precision": mixed_precision,
            "lr_G": 1e-4, "beta1": 0.9, "beta2": 0.999,
            "lr_scheme": "MultiStepLR", "lr_steps": [], "lr_gamma": 0.5,
            "pixel_criterion_forw": "l2", "pixel_criterion_back": "l1",
            "manual_seed": 10, "noise_type": "h265", "h265_sug": True,
            "lambda_fit_forw": 1, "lambda_rec_back": 0.1,
            "lambda_mimick_loss": 4, "gradient_clipping": 0.5,
        },
    })
    return CodecModel(opt)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mp", action="store_true",
                    help="also measure train.mixed_precision (bf16)")
    ap.add_argument("--iters", type=int, default=12)
    args = ap.parse_args()

    frames = SHAPE[0] * SHAPE[1]
    for mp in ([False, True] if args.mp else [False]):
        model = build_model(mp)
        hr = np.random.default_rng(0).random(SHAPE).astype(np.float32)
        model.feed_data({"GT": hr})
        t0 = time.perf_counter()
        model.optimize_parameters(1)  # compile
        compile_s = time.perf_counter() - t0
        # warm second call (second-shape caches, host pools)
        model.optimize_parameters(2)

        t0 = time.perf_counter()
        for i in range(args.iters):
            model.optimize_parameters(3 + i)
        dt = (time.perf_counter() - t0) / args.iters
        host = getattr(model, "last_codec_host_seconds", None)
        host_s = f"  host-codec {host * 1e3:6.2f} ms" if host else ""
        print(
            f"bf16={mp!s:5}  {dt * 1e3:8.2f} ms/step  "
            f"({1 / dt:6.2f} steps/s, {frames / dt:7.1f} frames/s)"
            f"{host_s}  [first-call {compile_s:.0f}s]"
        )


if __name__ == "__main__":
    main()
