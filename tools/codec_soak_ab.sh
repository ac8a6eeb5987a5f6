#!/bin/bash
# VERDICT r4 item 5: sustained real-x265 codec-training soak with the
# host-codec overlap question answered by measurement. Phase A runs the
# serial split-at-codec step (the reference's structure: the step waits
# for the whole encoder span); phase B turns on train.codec_pipeline (the
# one-step-stale host/device pipeline, codec_model._optimize_pipelined)
# and runs the long window. The trainer logs codec_tot_s (full encoder
# wall) vs codec_wait_s (what the step actually paid) per print, so the
# overlap share is read straight from the log.
#
#   bash tools/codec_soak_ab.sh [A_SECS=420] [B_SECS=2400]
set -u
cd /root/repo
A_SECS=${1:-420}
B_SECS=${2:-2400}
CFG=selfc_tpu/configs/train/train_compression_soak.yml
EXP=experiments/SelfC_codec_soak
OUT=runs/400k/codec_soak_r05.log
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_ccache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=2

say() { echo "[soakAB] $(date -u +%H:%M:%S) $*" | tee -a "$OUT"; }
mkdir -p runs/400k
: > "$OUT"
echo "# Real-x265 codec soak, serial (A) vs codec_pipeline (B) — $(date -u)" >> "$OUT"

run_window() {  # run_window <tag> <secs> <pipeline 0|1>
  local tag=$1 secs=$2 pipe=$3
  local runcfg=/tmp/soak_${tag}.yml
  local latest
  latest=$(ls "$EXP"/training_state/*.state 2>/dev/null \
    | sed 's,.*/,,;s,\.state,,' | grep -E '^[0-9]+$' | sort -rn | head -1)
  python - "$CFG" "${latest:-}" "$runcfg" "$pipe" <<'EOF'
import sys, yaml
base, latest, out, pipe = sys.argv[1:5]
with open(base) as f:
    opt = yaml.safe_load(f)
if latest:
    opt["path"]["resume_state"] = (
        f"experiments/SelfC_codec_soak/training_state/{latest}.state")
opt["train"]["codec_pipeline"] = pipe == "1"
opt["logger"]["save_checkpoint_freq"] = 1000.0
with open(out, "w") as f:
    yaml.safe_dump(opt, f)
EOF
  say "window $tag: ${secs}s, codec_pipeline=$pipe, resume_from=${latest:-scratch}"
  timeout $((secs + 1500)) python train.py -opt "$runcfg" >> /tmp/soak_${tag}.out 2>&1 &
  local tpid=$!
  # the window clock starts at the FIRST STEP, not at launch — a cold
  # tunnel compile would otherwise eat the whole budget
  local warm=$(( $(date +%s) + 1200 ))
  while kill -0 "$tpid" 2>/dev/null && [ "$(date +%s)" -lt "$warm" ]; do
    grep -q "<epoch:" /tmp/soak_${tag}.out 2>/dev/null && break
    sleep 5
  done
  local end=$(( $(date +%s) + secs ))
  while kill -0 "$tpid" 2>/dev/null && [ "$(date +%s)" -lt "$end" ]; do sleep 10; done
  if kill -0 "$tpid" 2>/dev/null; then
    kill -TERM "$tpid" 2>/dev/null
    for _ in $(seq 1 60); do kill -0 "$tpid" 2>/dev/null || break; sleep 3; done
    kill -0 "$tpid" 2>/dev/null && kill -9 "$tpid" 2>/dev/null
  fi
  wait "$tpid" 2>/dev/null
  say "window $tag done (exit=$?)"
  # fold this window's train log into the artifact
  local tlog
  tlog=$(ls -t "$EXP"/train_*.log 2>/dev/null | head -1)
  if [ -n "${tlog:-}" ]; then
    echo "===== window $tag (pipeline=$pipe) — $tlog" >> "$OUT"
    grep "<epoch:" "$tlog" | tail -40 >> "$OUT"
  fi
}

run_window A "$A_SECS" 0
run_window B "$B_SECS" 1

# ---- summary: steps/s + overlap share from the two windows ------------
python - "$OUT" <<'EOF' | tee -a "$OUT"
import re, sys
path = sys.argv[1]
with open(path) as f:
    txt = f.read()
for tag in ("A", "B"):
    m = re.findall(
        rf"===== window {tag}.*?\n(.*?)(?====== window |\Z)", txt, re.S)
    if not m:
        continue
    lines = [l for l in m[-1].splitlines() if "<epoch:" in l]
    if len(lines) < 2:
        continue
    def g(line, key):
        mm = re.search(rf"{key}: ([0-9.e+-]+)", line)
        return float(mm.group(1)) if mm else None
    walls = [g(l, "wall_s") for l in lines if g(l, "wall_s")]
    tots = [g(l, "codec_tot_s") for l in lines if g(l, "codec_tot_s")]
    waits = [g(l, "codec_wait_s") for l in lines if g(l, "codec_wait_s") is not None]
    its = [int(re.search(r"iter:\s*([\d,]+)", l).group(1).replace(",", ""))
           for l in lines]
    if walls:
        w = sum(walls[-5:]) / len(walls[-5:])
        out = [f"[summary {tag}] iters {its[0]}->{its[-1]}, "
               f"wall/iter {w:.3f}s ({1/w:.2f} it/s)"]
        if tots and waits:
            t = sum(tots[-5:]) / len(tots[-5:])
            v = sum(waits[-5:]) / len(waits[-5:])
            out.append(f"codec_tot {t:.3f}s, codec_wait {v:.3f}s, "
                       f"overlap share {(1 - v / t) * 100:.1f}%")
        print("; ".join(out))
EOF
say "soak A/B complete"
