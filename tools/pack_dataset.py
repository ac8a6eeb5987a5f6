#!/usr/bin/env python
"""Pack an LQGTVID PNG tree into the decode-free mmap format.

Usage:
  PYTHONPATH=/root/repo python tools/pack_dataset.py \
      --dataroot /data/vimeo/GT --list /data/vimeo/list.txt \
      --out /data/vimeo_packed

Then point the train config at it:
  datasets.train.mode: LQGTVID_packed
  datasets.train.dataroot_GT: /data/vimeo_packed

See selfc_tpu/data/packed.py for the format.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from selfc_tpu.data.packed import pack_lqgtvid  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataroot", required=True)
    ap.add_argument("--list", dest="data_list", default=None,
                    help="clip list file (default: <dataroot>/list.txt)")
    ap.add_argument("--out", required=True)
    args = ap.parse_args()
    data_list = args.data_list or os.path.join(args.dataroot, "list.txt")
    index = pack_lqgtvid(args.dataroot, data_list, args.out, verbose=True)
    n_frames = sum(c["n_frames"] for c in index["clips"])
    print(f"packed {len(index['clips'])} clips / {n_frames} frames "
          f"({index['total_bytes'] / 2**20:.1f} MiB) -> {args.out}")


if __name__ == "__main__":
    main()
