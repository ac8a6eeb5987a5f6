#!/bin/bash
# Capture an on-chip jax.profiler trace of the 400k train step (VERDICT r3
# item 3) WITHOUT paying a fresh tunnel compile or a second chip claim:
# launches train.py on the EXACT 400k config (warm persistent-cache hit)
# against a throwaway copy of the newest resumable pair, with the
# SELFC_TPU_PROFILE_AT hook armed; stops it right after the trace closes.
#
# Precondition: the 400k trainer is paused (touch /tmp/train400k.pause and
# wait for "[loop] train.py exit" — the chip is single-client).
#
#   bash tools/profile_window.sh [TRACE_DIR=/tmp/jax_trace_train]
set -u
cd /root/repo
TRACE=${1:-/tmp/jax_trace_train}
SRC=${TRAIN_EXP:-/root/repo/.train_wt/experiments/SelfC_large_GMM_400k}
LOG=/tmp/profile_window.log

IT=$(ls "$SRC"/training_state/*.state 2>/dev/null \
  | sed 's,.*/,,;s,\.state,,' | grep -E '^[0-9]+$' | sort -rn \
  | while read -r i; do [ -f "$SRC/models/${i}_G.msgpack" ] && { echo "$i"; break; }; done)
[ -z "${IT:-}" ] && { echo "no resumable pair under $SRC"; exit 1; }
# check_resume points pretrain_model_G at the EXPERIMENT's own models dir
# (config.py:79-84), so the pair must be seeded there, not in /tmp
EXP=/root/repo/experiments/SelfC_profile_window
rm -rf "$EXP"; mkdir -p "$EXP/training_state" "$EXP/models"
cp "$SRC/training_state/$IT.state" "$EXP/training_state/"
cp "$SRC/models/${IT}_G.msgpack" "$EXP/models/"

CFG=/tmp/profile_window.yml
python - "$IT" <<'EOF'
import sys, yaml
it = int(sys.argv[1])
with open("selfc_tpu/configs/train/train_rescaling_400k_packed.yml") as f:
    opt = yaml.safe_load(f)
opt["name"] = "SelfC_profile_window"
opt["path"]["resume_state"] = (
    f"/root/repo/experiments/SelfC_profile_window/training_state/{it}.state"
)
opt["train"]["niter"] = it + 60
opt["logger"]["save_checkpoint_freq"] = 1e9  # no checkpoints
opt["train"]["val_freq"] = 1e9
with open("/tmp/profile_window.yml", "w") as f:
    yaml.safe_dump(opt, f)
print("profile config: resume at", it)
EOF

rm -rf "$TRACE"
PYTHONPATH=/root/repo:/root/.axon_site \
JAX_COMPILATION_CACHE_DIR=/tmp/jax_ccache \
JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=2 \
SELFC_TPU_PROFILE_AT=$((IT + 10)) SELFC_TPU_PROFILE_STEPS=4 \
SELFC_TPU_PROFILE_DIR="$TRACE" \
  python train.py -opt "$CFG" > "$LOG" 2>&1 &
TPID=$!
echo "$TPID" > /tmp/profile_window.pid
# niter = it+60 -> train.py exits cleanly on its own shortly after the
# trace closes; SIGTERM only as a fallback. NEVER SIGKILL mid-compile
# (a killed remote compile wedges the tunnel for tens of minutes).
TERMED=0
for _ in $(seq 1 240); do
  kill -0 "$TPID" 2>/dev/null || break
  if [ "$TERMED" = 0 ] && grep -q "profiler: trace closed" "$LOG" 2>/dev/null; then
    sleep 5; kill -TERM "$TPID" 2>/dev/null; TERMED=1
  fi
  sleep 5
done
wait "$TPID" 2>/dev/null
grep -E "profiler:|iter:" "$LOG" | tail -5
ls "$TRACE"/plugins/profile/* 2>/dev/null | head -3
