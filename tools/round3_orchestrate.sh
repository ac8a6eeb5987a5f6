#!/bin/bash
# Round-3 session orchestrator: owns the ONE chip for the whole window.
#   phase 1  train the 400k recipe (tools/train400k_loop.sh) until STOP_AT
#   phase 2  graceful stop -> commit the resumable {params,opt-state} pair
#   phase 3  chip measurement artifacts (VERDICT r2 items 3-6), each
#            timeout-bounded and committed as it lands
# Launch DETACHED so it survives builder-session death:
#   setsid nohup bash tools/round3_orchestrate.sh <STOP_AT_EPOCH> <HARD_END_EPOCH> \
#     > /tmp/round3_orch.log 2>&1 &
set -u
cd /root/repo
STOP_AT=${1:?stop epoch-seconds}
HARD_END=${2:?hard-end epoch-seconds}
OUT=runs/400k
EXP=experiments/SelfC_large_GMM_400k
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_ccache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=2

say() { echo "[orch] $(date -u +%H:%M:%S) $*"; }

commit() {  # commit <msg> [paths...]
  local msg=$1; shift
  git add "$@" 2>/dev/null
  git commit -q -m "$msg" 2>/dev/null && say "committed: $msg" || say "nothing to commit for: $msg"
}

# ---- phase 1: train -------------------------------------------------
rm -f /tmp/train400k.stop
setsid nohup bash tools/train400k_loop.sh > /dev/null 2>&1 &
echo $! > /tmp/loop.pid
say "loop launched pid $(cat /tmp/loop.pid); training until $(date -u -d @"$STOP_AT" +%H:%M:%S)"

LAST_SNAP=0
while [ "$(date +%s)" -lt "$STOP_AT" ]; do
  sleep 30
  NOW=$(date +%s)
  if [ $((NOW - LAST_SNAP)) -ge 600 ]; then
    cp -f /tmp/train400k_loop.log "$OUT/train_loop.log" 2>/dev/null
    commit "400k run: periodic log snapshot ($(tail -1 "$OUT/train_loop.log" 2>/dev/null | cut -c1-60))" "$OUT/train_loop.log"
    LAST_SNAP=$NOW
  fi
done

# ---- phase 2: graceful stop + resumable pair ------------------------
say "stopping trainer"
touch /tmp/train400k.stop
[ -f /tmp/train.pid ] && kill -TERM "$(cat /tmp/train.pid)" 2>/dev/null
for _ in $(seq 1 60); do
  [ -f /tmp/train.pid ] && kill -0 "$(cat /tmp/train.pid)" 2>/dev/null || break
  sleep 3
done
if [ -f /tmp/train.pid ] && kill -0 "$(cat /tmp/train.pid)" 2>/dev/null; then
  say "trainer did not exit in 180s; SIGKILL"
  kill -9 "$(cat /tmp/train.pid)" 2>/dev/null
fi
# wait for the loop to run its snapshot block and break on the stop-file
for _ in $(seq 1 20); do
  kill -0 "$(cat /tmp/loop.pid)" 2>/dev/null || break
  sleep 3
done
kill -9 "$(cat /tmp/loop.pid)" 2>/dev/null
cp -f /tmp/train400k_loop.log "$OUT/train_loop.log" 2>/dev/null
commit "400k run: resumable pair at iter $(cat $OUT/latest_iter.txt 2>/dev/null || echo '?') (params+opt-state; bootstraps next session/round)" \
  "$OUT/latest.state" "$OUT/latest_G.msgpack" "$OUT/latest_iter.txt" "$OUT/train_loop.log"

# ---- phase 3: chip artifacts ----------------------------------------
phase() {  # phase <tag> <timeout_s> <cmd...>
  local tag=$1 to=$2; shift 2
  if [ "$(date +%s)" -ge "$HARD_END" ]; then say "skip $tag (past hard end)"; return; fi
  say "phase $tag"
  timeout "$to" "$@" > "$OUT/$tag.log" 2>&1
  say "phase $tag exit=$?"
  commit "round3 chip artifact: $tag" "$OUT/$tag.log"
}

CKPT=$(ls -t "$EXP"/models/*_G.msgpack 2>/dev/null | head -1)

SELFC_TPU_TEST_TPU=1 phase tpu_lane 480 python -m pytest -m tpu -q
phase deform 300 python tools/bench_deform.py
[ -n "${CKPT:-}" ] && phase parity_r03 540 python tools/parity_rescaling.py --ckpt "$CKPT" --root /tmp/synth_parity
phase codec_batched 480 python tools/bench_codec_eval.py --mode batched --reps 2
phase codec_serial 420 python tools/bench_codec_eval.py --mode serial --reps 1
phase ablate 420 python tools/bench_train_parts.py --mp --ablate
phase bench 300 python bench.py
say "orchestrator done"
