#!/usr/bin/env python
"""Golden-log regression comparison.

The reference's verification strategy is golden-log diffing: committed
runs of test_compression.py at crf q in {9,11,13,17,21}
(reference test_logs/VUG_compression_bf/*.log; README.md:72). This tool
parses the metric lines out of two logs (a golden reference log and a run
of our test_compression.py / test_rescaling.py) and reports per-metric
deltas against tolerances.

Usage:
  python tools/compare_logs.py golden.log ours.log [--tol-psnr 0.1]
         [--tol-ssim 0.002] [--tol-bpp 0.02]
"""

from __future__ import annotations

import argparse
import re
import sys

PATTERNS = {
    # "----Average PSNR/SSIM results for X----\n psnr: ... ssim: ... LR psnr ..."
    "avg_block": re.compile(
        r"Average PSNR/SSIM results for (?P<name>[^-]+)----\s*"
        r"psnr: (?P<psnr>[\d.]+) db; ssim: (?P<ssim>[\d.nan]+)\. "
        r"LR psnr: (?P<psnr_lr>[\d.]+) db; ssim: (?P<ssim_lr>[\d.nan]+)\.",
        re.S,
    ),
    "bpp_block": re.compile(
        r"Average Compression results for (?P<name>[^-]+)----\s*"
        r"ave_video_distor_loss: (?P<vdl>[\d.eE+-]+); "
        r"ave_video_bpp: (?P<vbpp>[\d.eE+-]+)dB\. "
        r"ave_img_distor_loss: (?P<idl>[\d.eE+-]+); "
        r"ave_img_bpp: (?P<ibpp>[\d.eE+-]+)dB\.",
        re.S,
    ),
    "hr_line": re.compile(
        r"HR results for (?P<name>\S+), PSNR (?P<psnr>[\d.]+)dB, "
        r"SSIM (?P<ssim>[\d.]+)"
    ),
    "lr_line": re.compile(
        r"LR results for (?P<name>\S+), PSNR (?P<psnr>[\d.]+)dB, "
        r"SSIM (?P<ssim>[\d.]+)"
    ),
}


def parse(path: str):
    text = open(path, errors="replace").read()
    out = {}
    for kind, pat in PATTERNS.items():
        for m in pat.finditer(text):
            d = m.groupdict()
            name = d.pop("name").strip()
            for k, v in d.items():
                try:
                    out[(kind, name, k)] = float(v)
                except ValueError:
                    pass
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("golden")
    ap.add_argument("ours")
    ap.add_argument("--tol-psnr", type=float, default=0.10)
    ap.add_argument("--tol-ssim", type=float, default=0.002)
    ap.add_argument("--tol-bpp", type=float, default=0.02)
    args = ap.parse_args()

    g, o = parse(args.golden), parse(args.ours)
    common = sorted(set(g) & set(o))
    if not common:
        print("no common metric lines found")
        sys.exit(2)
    failed = 0
    for key in common:
        kind, name, metric = key
        dv = o[key] - g[key]
        tol = args.tol_psnr
        if "ssim" in metric or metric in ("vdl", "idl"):
            tol = args.tol_ssim
        if "bpp" in metric:
            tol = args.tol_bpp
        status = "OK " if abs(dv) <= tol else "FAIL"
        if status == "FAIL":
            failed += 1
        print(f"[{status}] {name:24s} {metric:8s} golden={g[key]:.6f} "
              f"ours={o[key]:.6f} delta={dv:+.6f} (tol {tol})")
    print(f"\n{len(common)} metrics compared, {failed} outside tolerance")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
