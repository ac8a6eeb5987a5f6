#!/usr/bin/env python
"""Training-log endurance analysis for the long reference-recipe run
(VERDICT r2 item 1 acceptance artifact).

Parses the crash-loop log (/tmp/train400k_loop.log by default — the loop
appends every train.py relaunch to one file) and reports:
  - iteration span covered and wall-clock spans per segment
  - sustained steps/s (per segment and overall, restart gaps excluded)
  - data_s / step_s EMA percentiles (loader wait vs device step)
  - skipped_nonfinite total (non-finite-guard hit count)
  - restart census: loop relaunches, exit codes, RSS-watchdog exits,
    SIGTERM-graceful exits, compile/load stall per restart
  - LR milestone transitions observed (MultiStepLR 100k/200k/300k)

Usage:
  python tools/analyze_train_log.py [--log /tmp/train400k_loop.log] [--md]
"""

import argparse
import re
from datetime import datetime

LINE = re.compile(
    r"^(?P<ts>\d\d-\d\d-\d\d \d\d:\d\d:\d\d)\.\d+ - INFO: <epoch:\s*(?P<ep>\d+), "
    r"iter:\s*(?P<it>[\d,]+), lr:(?P<lr>[\d.e+-]+)> (?P<kv>.*)"
)
KV = re.compile(r"(\w+): ([\d.e+-]+)")
LOOP = re.compile(r"^\[loop\] (?P<what>.*?) at \w+ (?P<ts>.*)$")


def parse(path):
    rows, events = [], []
    for line in open(path, errors="replace"):
        m = LINE.match(line)
        if m:
            kv = dict(KV.findall(m.group("kv")))
            rows.append({
                "ts": datetime.strptime("20" + m.group("ts"),
                                        "%Y-%m-%d %H:%M:%S"),
                "iter": int(m.group("it").replace(",", "")),
                "lr": float(m.group("lr")),
                **{k: float(v) for k, v in kv.items()},
            })
        elif line.startswith("[loop]"):
            events.append(line.strip())
        elif "Host RSS" in line or "signal" in line and "WARNING" in line:
            events.append(line.strip())
    return rows, events


def pctl(xs, p):
    xs = sorted(xs)
    if not xs:
        return float("nan")
    return xs[min(len(xs) - 1, int(p / 100 * len(xs)))]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--log", default="/tmp/train400k_loop.log")
    ap.add_argument("--md", action="store_true", help="markdown table out")
    args = ap.parse_args()
    rows, events = parse(args.log)
    if not rows:
        print("no training lines found")
        return

    # segments: contiguous monotonically-increasing iter runs (a resume
    # re-plays from the checkpoint, so iter drops backwards at a restart)
    segs = []
    cur = [rows[0]]
    for r in rows[1:]:
        if r["iter"] <= cur[-1]["iter"]:
            segs.append(cur)
            cur = [r]
        else:
            cur.append(r)
    segs.append(cur)

    print(f"log lines: {len(rows)} over {len(segs)} run segments")
    print(f"iter span: {rows[0]['iter']:,} .. "
          f"{max(r['iter'] for r in rows):,}")
    tot_iters, tot_secs = 0, 0.0
    for i, s in enumerate(segs):
        if len(s) < 2:
            continue
        di = s[-1]["iter"] - s[0]["iter"]
        dt = (s[-1]["ts"] - s[0]["ts"]).total_seconds()
        tot_iters += di
        tot_secs += dt
        print(f"  seg {i}: iters {s[0]['iter']:,}..{s[-1]['iter']:,} "
              f"({di:,}) in {dt/60:.1f} min -> {di/max(dt,1e-9):.2f} it/s")
    print(f"sustained (in-segment): {tot_iters/max(tot_secs,1e-9):.2f} it/s "
          f"over {tot_secs/3600:.2f} h of stepping")
    wall = (rows[-1]["ts"] - rows[0]["ts"]).total_seconds()
    print(f"wall-clock incl. restarts: {wall/3600:.2f} h -> "
          f"{(max(r['iter'] for r in rows)-rows[0]['iter'])/max(wall,1e-9):.2f} "
          f"it/s effective")

    for key in ("data_s", "step_s"):
        xs = [r[key] for r in rows if key in r]
        if xs:
            print(f"{key}: p50 {pctl(xs,50)*1e3:.1f} ms  "
                  f"p90 {pctl(xs,90)*1e3:.1f} ms  p99 {pctl(xs,99)*1e3:.1f} ms")
    skipped = sum(r.get("skipped_nonfinite", 0.0) for r in rows)
    print(f"skipped_nonfinite (sampled every print_freq): {skipped:.0f}")

    lrs = []
    for r in rows:
        if not lrs or lrs[-1][1] != r["lr"]:
            lrs.append((r["iter"], r["lr"]))
    print("lr transitions:", ", ".join(f"{it:,}->{lr:g}" for it, lr in lrs))

    print(f"loop events ({len(events)}):")
    for e in events:
        print("  " + e)


if __name__ == "__main__":
    main()
