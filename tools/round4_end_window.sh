#!/bin/bash
# Round-4 end window: stop the 400k loop, then produce the final-checkpoint
# artifacts with maximum parallelism — parity (CPU torch + CPU jax) runs
# alongside the chip phases (precision delta, tpu test lane). Each artifact
# commits with its exit code (ADVICE r3: no success-looking commits for
# failed phases).
set -u
cd /root/repo
OUT=runs/400k
EXP=/root/repo/.train_wt/experiments/SelfC_large_GMM_400k
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_ccache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=2

say() { echo "[end4] $(date -u +%H:%M:%S) $*"; }
commit() { local msg=$1; shift; git reset -q; git add -f "$@" 2>/dev/null; \
  git commit -q -m "$msg" && say "committed: $msg" || say "nothing to commit: $msg"; }

# 1. stop the loop + trainer (graceful: SIGTERM -> checkpoint)
touch /tmp/train400k.stop
for _ in $(seq 1 80); do
  [ -f /tmp/train.pid ] && kill -0 "$(cat /tmp/train.pid)" 2>/dev/null || break
  sleep 3
done
for _ in $(seq 1 30); do ps aux | grep -q "[t]rain400k_loop" || break; sleep 3; done
sleep 5
cp -f /tmp/train400k_loop.log "$OUT/train_loop.log" 2>/dev/null
IT=$(cat "$OUT/latest_iter.txt" 2>/dev/null || echo '?')
say "trainer stopped at iter $IT"
commit "400k run: end-of-round-4 state (iter $IT)" \
  "$OUT/train_loop.log" "$OUT/latest_iter.txt" "$OUT/latest.state" "$OUT/latest_G.msgpack"

# 2. chip: precision delta on the final committed checkpoint (bg)
( timeout 780 python tools/precision_delta.py --ckpt "$OUT/latest_G.msgpack" \
    --val /tmp/synth_val_packed > "$OUT/precision_r04.log" 2>&1; \
  echo "[end4] exit=$?" >> "$OUT/precision_r04.log" ) &
PREC=$!

# 3. CPU: final-checkpoint parity through both stacks (bg, niced)
( JAX_PLATFORMS=cpu nice -n 5 timeout 1500 python tools/parity_rescaling.py \
    --ckpt "$OUT/latest_G.msgpack" --root /tmp/synth_parity \
    > "$OUT/parity_r04.log" 2>&1; \
  echo "[end4] exit=$?" >> "$OUT/parity_r04.log" ) &
PAR=$!

wait $PREC; say "precision done"; commit \
  "round4 chip artifact: fp32-vs-bf16 precision delta on the iter-$IT checkpoint" \
  "$OUT/precision_r04.log"

# 4. chip: on-TPU kernel test lane (after precision releases the chip)
( SELFC_TPU_TEST_TPU=1 timeout 700 python -m pytest -m tpu -q \
    > "$OUT/tpu_lane.log" 2>&1; echo "[end4] exit=$?" >> "$OUT/tpu_lane.log" ) &
LANE=$!

wait $PAR; say "parity done"; commit \
  "round4 chip artifact: final-checkpoint parity (iter $IT) through both stacks" \
  "$OUT/parity_r04.log"
wait $LANE; say "tpu lane done"; commit \
  "round4 chip artifact: on-TPU kernel test lane" "$OUT/tpu_lane.log"
say "end window complete"
