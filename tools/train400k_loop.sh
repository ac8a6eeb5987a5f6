#!/bin/bash
# Crash-proof driver for the full 400k-iter reference-recipe training run
# (VERDICT r2 item 1). Runs train.py in a loop; on any non-zero exit
# (session kill, OOM, tunnel hiccup) it regenerates a resume config
# pointed at the newest training_state and relaunches. Exits when the
# final iteration's state exists or train.py completes cleanly.
#
# Durability model (round-4 hardening): a background watcher snapshots the
# newest COMPLETE {iter}_G.msgpack + {iter}.state pair into the git repo at
# every checkpoint cadence (5k iters), not just on trainer exit, so a hard
# VM recycle costs at most one checkpoint interval. Snapshot commits are
# made with git plumbing against a private index (never the repo's staging
# area) and replace the previous snapshot commit in place when it is still
# HEAD, so repeated 40 MB pairs don't pile up in history.
#
# Launch detached (survives the driving session):
#   setsid nohup bash /root/repo/tools/train400k_loop.sh >/dev/null 2>&1 &
set -u
# TRAIN_REPO lets the run execute from a frozen git worktree so edits to
# the live repo can't change the trainer's code under a crash-relaunch.
cd "${TRAIN_REPO:-/root/repo}"
BASE=${TRAIN_CFG:-selfc_tpu/configs/train/train_rescaling_400k_packed.yml}
EXP=${TRAIN_EXP:-experiments/SelfC_large_GMM_400k}
LOG=${TRAIN_LOG:-/tmp/train400k_loop.log}
TARGET=${TRAIN_TARGET:-400000}
SNAP=/root/repo/runs/400k
MAIN_REPO=/root/repo

# ---------------------------------------------------------------------
# newest iter that has BOTH files of the resumable pair (params msgpack is
# written before the .state, so a .state implies its msgpack exists unless
# a crash landed exactly between the two writes — check both anyway).
newest_complete_pair() {
  ls "$EXP"/training_state/*.state 2>/dev/null \
    | sed 's,.*/,,;s,\.state,,' | grep -E '^[0-9]+$' | sort -rn \
    | while read -r it; do
        [ -f "$EXP/models/${it}_G.msgpack" ] && { echo "$it"; break; }
      done
}

# Copy the pair for iter $1 into runs/400k atomically, validate the copies,
# and commit them with plumbing (private index + compare-and-swap ref
# update; replaces the previous snapshot commit when it is still HEAD).
snapshot_pair() {  # serialized: watcher + exit-time calls may overlap
  (
    flock -w 300 9 || exit 1
    _snapshot_pair_inner "$1"
  ) 9>/tmp/snap400k.lock
}

_snapshot_pair_inner() {
  local it=$1
  mkdir -p "$SNAP"
  cp -f "$EXP/training_state/$it.state" "$SNAP/.latest.state.tmp" || return 1
  cp -f "$EXP/models/${it}_G.msgpack" "$SNAP/.latest_G.msgpack.tmp" || return 1
  # validate the COPY (guards against truncation mid-cp on a dying VM)
  local got
  got=$(python - "$SNAP/.latest.state.tmp" <<'EOF'
import pickle, sys
try:
    with open(sys.argv[1], "rb") as f:
        print(pickle.load(f)["iter"])
except Exception:
    pass
EOF
)
  if [ "$got" != "$it" ]; then
    echo "[snap] iter $it copy failed validation (got '$got'); skipping" >> "$LOG"
    rm -f "$SNAP/.latest.state.tmp" "$SNAP/.latest_G.msgpack.tmp"
    return 1
  fi
  mv -f "$SNAP/.latest.state.tmp" "$SNAP/latest.state"
  mv -f "$SNAP/.latest_G.msgpack.tmp" "$SNAP/latest_G.msgpack"
  echo "$it" > "$SNAP/latest_iter.txt"
  cp -f "$LOG" "$SNAP/train_loop.log" 2>/dev/null

  # ---- plumbing commit: private index, CAS ref update -----------------
  (
    cd "$MAIN_REPO" || exit 1
    local_head=$(git rev-parse HEAD) || exit 1
    export GIT_INDEX_FILE=/tmp/snap400k.index
    rm -f "$GIT_INDEX_FILE"
    git read-tree "$local_head" || exit 1
    git add -f runs/400k/latest.state runs/400k/latest_G.msgpack \
               runs/400k/latest_iter.txt runs/400k/train_loop.log || exit 1
    tree=$(git write-tree) || exit 1
    unset GIT_INDEX_FILE
    if [ "$tree" = "$(git rev-parse "$local_head^{tree}")" ]; then
      exit 0  # nothing new
    fi
    msg="400k run: resumable pair at iter $it (params+opt-state auto-snapshot)"
    prev=$(cat /tmp/snap400k.sha 2>/dev/null || echo none)
    if [ "$local_head" = "$prev" ]; then
      # replace the previous snapshot commit in place (same parent)
      parent=$(git rev-parse "$local_head^")
    else
      parent=$local_head
    fi
    new=$(git commit-tree "$tree" -p "$parent" -m "$msg") || exit 1
    # atomic: only move the branch if HEAD hasn't changed underneath us
    if git update-ref refs/heads/main "$new" "$local_head" 2>/dev/null; then
      echo "$new" > /tmp/snap400k.sha
      echo "[snap] committed pair at iter $it ($new)" >> "$LOG"
    else
      echo "[snap] ref moved during snapshot of iter $it; will retry" >> "$LOG"
    fi
  )
}

# Background watcher: snapshot every new complete pair (checkpoint cadence
# is 5k iters, so this commits roughly every 5k).
watcher() {
  local last=-1
  while [ ! -f /tmp/train400k.stop ]; do
    sleep 60
    local it
    it=$(newest_complete_pair)
    if [ -n "${it:-}" ] && [ "$it" -gt "$last" ]; then
      snapshot_pair "$it" && last=$it
    fi
  done
}

# Data prep (idempotent): a fresh VM has an empty /tmp — regenerate the
# packed synthetic train/val sets before launching, or train.py would
# crash-loop on a missing dataroot.
if [ ! -f /tmp/synth_train_packed/index.json ]; then
  echo "[loop] regenerating packed train data at $(date)" >> "$LOG"
  python tools/make_synth_data.py --root /tmp/synth_train --clips 240 \
    --frames 20 --height 208 --width 208 >> "$LOG" 2>&1
  PYTHONPATH="${TRAIN_REPO:-/root/repo}" python tools/pack_dataset.py \
    --dataroot /tmp/synth_train --out /tmp/synth_train_packed >> "$LOG" 2>&1
fi
if [ ! -f /tmp/synth_val_packed/index.json ]; then
  echo "[loop] regenerating packed val data at $(date)" >> "$LOG"
  python tools/make_synth_data.py --root /tmp/synth_val --clips 4 \
    --frames 7 --height 576 --width 704 --seed 7 >> "$LOG" 2>&1
  PYTHONPATH="${TRAIN_REPO:-/root/repo}" python tools/pack_dataset.py \
    --dataroot /tmp/synth_val --out /tmp/synth_val_packed >> "$LOG" 2>&1
fi

# Bootstrap: if this (possibly fresh) VM has no experiments dir but the
# git repo carries a committed resumable pair (runs/400k/latest.state +
# latest_G.msgpack), seed the experiments tree from it so the run
# CONTINUES across VM recycles and build rounds instead of restarting.
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

watcher &
WATCHER_PID=$!

while true; do
  [ -f /tmp/train400k.stop ] && { echo "[loop] stop-file at $(date)" >> "$LOG"; break; }
  LATEST=$(newest_complete_pair)
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
  PYTHONPATH="${TRAIN_REPO:-/root/repo}:/root/.axon_site" \
  JAX_COMPILATION_CACHE_DIR=/tmp/jax_ccache \
  JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=2 \
    python train.py -opt "$CFG" >> "$LOG" 2>&1 &
  TPID=$!
  echo "$TPID" > /tmp/train.pid
  # Monitor: a stop OR pause file triggers a graceful SIGTERM (train.py
  # checkpoints params+opt-state and exits 0); pause then holds the loop
  # below so the chip is free for profiling/eval until the file is removed.
  while kill -0 "$TPID" 2>/dev/null; do
    if [ -f /tmp/train400k.stop ] || [ -f /tmp/train400k.pause ]; then
      echo "[loop] stop/pause requested; SIGTERM trainer at $(date)" >> "$LOG"
      kill -TERM "$TPID" 2>/dev/null
      for _ in $(seq 1 60); do kill -0 "$TPID" 2>/dev/null || break; sleep 3; done
      kill -0 "$TPID" 2>/dev/null && kill -9 "$TPID" 2>/dev/null
      break
    fi
    sleep 5
  done
  wait "$TPID"
  RC=$?
  echo "[loop] train.py exit=$RC at $(date)" >> "$LOG"
  # Exit-time snapshot of the newest COMPLETE pair (params + opt-state —
  # the 2026-08-20 VM recycle proved committing only the .state loses the
  # run; and a .state whose msgpack is missing must not be snapshotted,
  # or bootstrap would seed mismatched params/opt-state).
  NEWEST=$(newest_complete_pair)
  [ -n "${NEWEST:-}" ] && snapshot_pair "$NEWEST"
  # Pause: hold here (chip free, pair already snapshotted) until released.
  while [ -f /tmp/train400k.pause ]; do
    [ -f /tmp/train400k.stop ] && break
    sleep 10
  done
  # NOTE: exit 0 does NOT end the loop — a SIGTERM-graceful shutdown also
  # exits 0 (checkpoint + return). Completion is detected solely by the
  # target check at the top of the loop.
  sleep 10
done
kill "$WATCHER_PID" 2>/dev/null
NEWEST=$(newest_complete_pair)
[ -n "${NEWEST:-}" ] && snapshot_pair "$NEWEST"
echo "[loop] done at $(date)" >> "$LOG"
