#!/bin/bash
# Crash-proof driver for the full 400k-iter reference-recipe training run
# (VERDICT r2 item 1). Runs train.py in a loop; on any non-zero exit
# (session kill, OOM, tunnel hiccup) it regenerates a resume config
# pointed at the newest training_state and relaunches. Exits when the
# final iteration's state exists or train.py completes cleanly.
#
# Launch detached (survives the driving session):
#   tmux new-session -d -s train400k 'bash /root/repo/tools/train400k_loop.sh'
set -u
# TRAIN_REPO lets the run execute from a frozen git worktree so edits to
# the live repo can't change the trainer's code under a crash-relaunch.
cd "${TRAIN_REPO:-/root/repo}"
BASE=selfc_tpu/configs/train/train_rescaling_400k_packed.yml
EXP=experiments/SelfC_large_GMM_400k
LOG=/tmp/train400k_loop.log
TARGET=400000

# Bootstrap: if this (possibly fresh) VM has no experiments dir but the
# git repo carries a committed resumable pair (runs/400k/latest.state +
# latest_G.msgpack), seed the experiments tree from it so the run
# CONTINUES across VM recycles and build rounds instead of restarting.
SNAP=/root/repo/runs/400k
if ! ls "$EXP"/training_state/*.state >/dev/null 2>&1 \
   && [ -f "$SNAP/latest.state" ] && [ -f "$SNAP/latest_G.msgpack" ]; then
  IT=$(python - "$SNAP/latest.state" <<'EOF'
import pickle, sys
with open(sys.argv[1], "rb") as f:
    print(pickle.load(f)["iter"])
EOF
)
  if [ -n "${IT:-}" ]; then
    mkdir -p "$EXP/training_state" "$EXP/models"
    cp -f "$SNAP/latest.state" "$EXP/training_state/$IT.state"
    cp -f "$SNAP/latest_G.msgpack" "$EXP/models/${IT}_G.msgpack"
    echo "[loop] bootstrapped iter $IT from committed pair at $(date)" >> "$LOG"
  fi
fi

while true; do
  [ -f /tmp/train400k.stop ] && { echo "[loop] stop-file at $(date)" >> "$LOG"; break; }
  LATEST=$(ls "$EXP"/training_state/*.state 2>/dev/null \
             | sed 's,.*/,,;s,\.state,,' | sort -n | tail -1)
  if [ -n "${LATEST:-}" ] && [ "$LATEST" -ge "$TARGET" ]; then
    echo "[loop] target $TARGET reached (state $LATEST) at $(date)" >> "$LOG"
    break
  fi
  CFG="$BASE"
  if [ -n "${LATEST:-}" ]; then
    CFG=/tmp/train400k_resume_auto.yml
    python - "$BASE" "$EXP/training_state/$LATEST.state" "$CFG" <<'EOF'
import sys, yaml
base, state, out = sys.argv[1:4]
with open(base) as f:
    opt = yaml.safe_load(f)
opt["path"]["resume_state"] = state
# bound crash loss: checkpoint every 5k once the loop owns the run
opt["logger"]["save_checkpoint_freq"] = 5000.0
with open(out, "w") as f:
    yaml.safe_dump(opt, f)
EOF
    echo "[loop] resuming from $LATEST at $(date)" >> "$LOG"
  else
    echo "[loop] fresh start at $(date)" >> "$LOG"
  fi
  # persistent compile cache: a crash-restart otherwise pays ~10 min
  # re-tracing+compiling the train step before the first resumed iter
  PYTHONPATH=/root/repo:/root/.axon_site \
  JAX_COMPILATION_CACHE_DIR=/tmp/jax_ccache \
  JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=2 \
    python train.py -opt "$CFG" >> "$LOG" 2>&1 &
  echo $! > /tmp/train.pid
  wait $!
  RC=$?
  echo "[loop] train.py exit=$RC at $(date)" >> "$LOG"
  # Preserve a RESUMABLE pair (params + opt-state) in the git repo: the
  # 2026-08-20 VM recycle proved that committing only the .state loses
  # the run — opt_state has no params, so resume needs {iter}_G.msgpack
  # too (selfc_tpu/train/checkpoint.py:84-101).
  NEWEST=$(ls "$EXP"/training_state/*.state 2>/dev/null \
             | sed 's,.*/,,;s,\.state,,' | sort -n | tail -1)
  if [ -n "${NEWEST:-}" ]; then
    mkdir -p /root/repo/runs/400k
    cp -f "$EXP/training_state/$NEWEST.state" /root/repo/runs/400k/latest.state
    cp -f "$EXP/models/${NEWEST}_G.msgpack" /root/repo/runs/400k/latest_G.msgpack 2>/dev/null
    cp -f "$LOG" /root/repo/runs/400k/train_loop.log 2>/dev/null
    echo "$NEWEST" > /root/repo/runs/400k/latest_iter.txt
    echo "[loop] snapshotted iter $NEWEST pair to runs/400k (commit it!)" >> "$LOG"
  fi
  # NOTE: exit 0 does NOT end the loop — a SIGTERM-graceful shutdown also
  # exits 0 (checkpoint + return). Completion is detected solely by the
  # target check at the top of the loop.
  sleep 10
done
echo "[loop] done at $(date)" >> "$LOG"
