#!/bin/bash
# Bounded on-chip probe of the 400k train step with optional config
# patches: resumes a throwaway copy of the newest pair, runs N iters, and
# reports the steady-state step_s/data_s EMAs from the log. Used to A/B
# candidate step optimizations (e.g. train.fused_optimizer) against the
# production configuration without touching the real run.
#
# Precondition: the 400k trainer is paused (the chip is single-client).
#   bash tools/train_probe.sh [--fused] [--iters N] [--tag NAME]
set -u
cd /root/repo
FUSED=0; ITERS=300; TAG=probe
while [ $# -gt 0 ]; do
  case "$1" in
    --fused) FUSED=1 ;;
    --iters) shift; ITERS=$1 ;;
    --tag) shift; TAG=$1 ;;
  esac; shift
done
SRC=${TRAIN_EXP:-/root/repo/.train_wt/experiments/SelfC_large_GMM_400k}
NAME=SelfC_probe_$TAG
EXP=/root/repo/experiments/$NAME
LOG=/tmp/train_probe_$TAG.log

IT=$(ls "$SRC"/training_state/*.state 2>/dev/null \
  | sed 's,.*/,,;s,\.state,,' | grep -E '^[0-9]+$' | sort -rn \
  | while read -r i; do [ -f "$SRC/models/${i}_G.msgpack" ] && { echo "$i"; break; }; done)
[ -z "${IT:-}" ] && { echo "no resumable pair under $SRC"; exit 1; }
rm -rf "$EXP"; mkdir -p "$EXP/training_state" "$EXP/models"
cp "$SRC/training_state/$IT.state" "$EXP/training_state/"
cp "$SRC/models/${IT}_G.msgpack" "$EXP/models/"

CFG=/tmp/train_probe_$TAG.yml
python - "$IT" "$ITERS" "$FUSED" "$NAME" "$CFG" <<'EOF'
import sys, yaml
it, iters, fused, name, out = int(sys.argv[1]), int(sys.argv[2]), \
    int(sys.argv[3]), sys.argv[4], sys.argv[5]
with open("selfc_tpu/configs/train/train_rescaling_400k_packed.yml") as f:
    opt = yaml.safe_load(f)
opt["name"] = name
opt["path"]["resume_state"] = (
    f"/root/repo/experiments/{name}/training_state/{it}.state")
opt["train"]["niter"] = it + iters
if fused:
    opt["train"]["fused_optimizer"] = True
opt["logger"]["save_checkpoint_freq"] = 1e9
opt["train"]["val_freq"] = 1e9
with open(out, "w") as f:
    yaml.safe_dump(opt, f)
print(f"probe config: resume at {it}, {iters} iters, fused={fused}")
EOF

PYTHONPATH=/root/repo:/root/.axon_site \
JAX_COMPILATION_CACHE_DIR=/tmp/jax_ccache \
JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=2 \
  python train.py -opt "$CFG" > "$LOG" 2>&1
echo "--- last step lines ($TAG, fused=$FUSED) ---"
grep "iter:" "$EXP"/train_*.log | tail -3
