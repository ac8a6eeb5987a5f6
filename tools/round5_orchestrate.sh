#!/bin/bash
# Round-5 DEADMAN BACKSTOP orchestrator. The builder session runs the end
# window interactively; this script only takes over if that session dies
# (no /tmp/round5_orch.disable). It waits until STOP_AT, then stops the
# 400k trainer gracefully and produces the highest-value end-of-round
# artifacts, committing each with its exit status.
#
# Launch DETACHED:
#   setsid nohup bash tools/round5_orchestrate.sh <STOP_AT_EPOCH> <HARD_END_EPOCH> \
#     > /tmp/round5_orch.log 2>&1 &
set -u
cd /root/repo
STOP_AT=${1:?stop epoch-seconds}
HARD_END=${2:?hard-end epoch-seconds}
OUT=runs/400k
EXP=/root/repo/.train_wt/experiments/SelfC_large_GMM_400k
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_ccache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=2

say() { echo "[orch5] $(date -u +%H:%M:%S) $*"; }

commit() {  # commit <msg> [paths...]
  local msg=$1; shift
  git reset -q  # refresh index: the train-loop watcher moves HEAD under us
  git add -f "$@" 2>/dev/null
  git commit -q -m "$msg" 2>/dev/null && say "committed: $msg" || say "nothing to commit for: $msg"
}

# ---- wait until STOP_AT ---------------------------------------------
while [ "$(date +%s)" -lt "$STOP_AT" ]; do
  sleep 60
  [ -f /tmp/round5_orch.disable ] && { say "disabled by builder; exiting"; exit 0; }
done
[ -f /tmp/round5_orch.disable ] && { say "disabled by builder; exiting"; exit 0; }
say "builder session presumed dead; backstop taking over"

# ---- stop trainer gracefully ----------------------------------------
touch /tmp/train400k.stop
for _ in $(seq 1 80); do
  [ -f /tmp/train.pid ] && kill -0 "$(cat /tmp/train.pid)" 2>/dev/null || break
  sleep 3
done
if [ -f /tmp/train.pid ] && kill -0 "$(cat /tmp/train.pid)" 2>/dev/null; then
  say "trainer did not exit in 240s; SIGKILL"
  kill -9 "$(cat /tmp/train.pid)" 2>/dev/null
fi
sleep 20  # give the loop its exit-time snapshot_pair
cp -f /tmp/train400k_loop.log "$OUT/train_loop.log" 2>/dev/null
IT=$(cat "$OUT/latest_iter.txt" 2>/dev/null || echo '?')
commit "400k run: end-of-round-5 state (iter $IT)" \
  "$OUT/train_loop.log" "$OUT/latest_iter.txt" "$OUT/latest.state" "$OUT/latest_G.msgpack"

# ---- phases ----------------------------------------------------------
phase() {  # phase <tag> <timeout_s> <cmd...>
  local tag=$1 to=$2; shift 2
  local now left
  now=$(date +%s); left=$((HARD_END - now))
  if [ "$left" -lt 90 ]; then say "skip $tag (only ${left}s to hard end)"; return; fi
  [ "$to" -gt "$left" ] && to=$((left - 30))
  say "phase $tag (budget ${to}s)"
  timeout "$to" "$@" > "$OUT/$tag.log" 2>&1
  local rc=$?
  echo "[orch5] exit=$rc" >> "$OUT/$tag.log"
  local status=ok; [ "$rc" -ne 0 ] && status="FAILED rc=$rc"
  say "phase $tag exit=$rc"
  commit "round5 chip artifact: $tag ($status)" "$OUT/$tag.log"
}

CKPT=$(ls -t "$EXP"/models/*_G.msgpack 2>/dev/null | head -1)
[ -n "${CKPT:-}" ] && CKPT=$(realpath "$CKPT")

phase precision_r05 900 python tools/precision_delta.py --ckpt "$OUT/latest_G.msgpack" --val /tmp/synth_val_packed
[ -n "${CKPT:-}" ] && JAX_PLATFORMS=cpu phase parity_r05 1500 python tools/parity_rescaling.py --ckpt "$CKPT" --root /tmp/synth_parity
SELFC_TPU_TEST_TPU=1 phase tpu_lane 700 python -m pytest -m tpu -q
SOAK_CKPT=$(ls -t experiments/SelfC_codec_soak/models/*_G.msgpack 2>/dev/null | head -1)
if [ -n "${SOAK_CKPT:-}" ] && [ -f /tmp/synth_uvg/list.txt ]; then
  phase rd_sweep_backstop 2400 python tools/rd_sweep.py --out runs/rd_x265 \
    --ckpt "$(realpath "$SOAK_CKPT")" --dataroot /tmp/synth_uvg
  commit "round5: RD sweep artifact (backstop)" runs/rd_x265
fi
say "backstop done"
