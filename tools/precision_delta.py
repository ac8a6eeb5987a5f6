#!/usr/bin/env python
"""Measure the metric cost of bf16 EVAL (val.eval_dtype: bfloat16) on a
trained checkpoint: the same clips run through the same roundtrip at fp32
(the reference eval precision) and bf16 (the serving-throughput mode the
PERF.md headline benches), Y-PSNR/SSIM compared per clip.

SURVEY hard-part #1: the reverse pass divides by exp(s) so low precision
compounds across the 8 coupling blocks — this is the measurement that
says whether the bf16 fps headline and the fp32 parity story describe
the same pipeline (round-2 VERDICT item 2).

Usage:
  python tools/precision_delta.py --ckpt experiments/<run>/models/best_G.msgpack \\
      --val /tmp/synth_val_packed [--gop 7]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--val", required=True, help="packed val dataset root")
    ap.add_argument("--gop", type=int, default=7)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax

    from selfc_tpu.config import dict_to_nonedict
    from selfc_tpu.data.loader import DataLoader, create_dataset
    from selfc_tpu.eval.rescaling import cal_metric
    from selfc_tpu.train.rescale_model import RescaleModel

    def build(eval_dtype):
        opt = dict_to_nonedict({
            "is_train": False, "model": "SelfC_GMM", "distortion": "sr_bd",
            "scale": 4,
            "datasets": {"train": {"video_len": 7, "GT_size": 144}},
            "network_G": {
                "which_model_G": {"subnet_type": "D2DTNet"},
                "in_nc": 3, "out_nc": 3, "block_num": [4, 4], "scale": 4,
                "init": "xavier", "global_module": "nonlocal",
                "stp_blk_num": 6, "fh_loss": "gmm", "gmm_k": 5,
            },
            "path": {"pretrain_model_G": args.ckpt},
            "val": {"eval_dtype": eval_dtype, "sample_seed": args.seed},
        })
        return RescaleModel(opt, rng_seed=args.seed)

    ds = create_dataset(dict_to_nonedict({
        "mode": "LQGTVID_packed", "phase": "val", "dataroot_GT": args.val,
        "video_len": args.gop, "scale": 4,
    }))
    rows = {}
    for dt in ("float32", "bfloat16"):
        loader = DataLoader(ds, batch_size=1, num_workers=1)
        model = build(dt)
        p, s, plr, slr = cal_metric(loader, model, "/tmp/_pd", save_images=False)
        rows[dt] = (p, s, plr, slr)
        print(f"{dt:9s}  HR {p:.4f} dB / {s:.6f}   LR {plr:.4f} dB / {slr:.6f}")
    dp = rows["float32"][0] - rows["bfloat16"][0]
    dssim = rows["float32"][1] - rows["bfloat16"][1]
    print(f"bf16 eval cost: {dp:+.4f} dB Y-PSNR, {dssim:+.6f} SSIM "
          f"(ckpt {os.path.basename(args.ckpt)}, backend {jax.default_backend()})")


if __name__ == "__main__":
    main()
