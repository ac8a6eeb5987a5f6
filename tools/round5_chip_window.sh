#!/bin/bash
# Round-5 interactive end window: pause the 400k trainer, then burn down
# the VERDICT r4 chip-artifact list in judge-priority order with strict
# per-phase budgets (a phase that overruns is killed and committed with
# its exit status; everything after still runs). Leaves the trainer
# PAUSED at the end so the driver's bench gets a free chip.
#
#   setsid nohup bash tools/round5_chip_window.sh > /tmp/round5_window.log 2>&1 &
set -u
cd /root/repo
OUT=runs/400k
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_ccache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=2

say() { echo "[win5] $(date -u +%H:%M:%S) $*"; }
commit() {  # commit <msg> [paths...]
  local msg=$1; shift
  git reset -q
  git add -f "$@" 2>/dev/null
  git commit -q -m "$msg" 2>/dev/null && say "committed: $msg" || say "nothing to commit for: $msg"
}
phase() {  # phase <tag> <budget_s> <artifact> <cmd...>
  local tag=$1 to=$2 art=$3; shift 3
  say "phase $tag (budget ${to}s)"
  timeout "$to" "$@" > "/tmp/win5_$tag.log" 2>&1
  local rc=$?
  say "phase $tag exit=$rc"
  echo "[win5] exit=$rc" >> "/tmp/win5_$tag.log"
  return $rc
}

# keep the deadman backstop away from the chip while this window runs
touch /tmp/round5_orch.disable

# ---- 0. pause the trainer (graceful checkpoint + snapshot commit) -----
touch /tmp/train400k.pause
for _ in $(seq 1 80); do
  [ -f /tmp/train.pid ] && kill -0 "$(cat /tmp/train.pid)" 2>/dev/null || break
  sleep 3
done
sleep 15  # loop's exit-time snapshot_pair
cp -f /tmp/train400k_loop.log "$OUT/train_loop.log" 2>/dev/null
IT=$(cat "$OUT/latest_iter.txt" 2>/dev/null || echo '?')
say "trainer paused at iter $IT"
commit "400k run: chip-window pause at iter $IT" \
  "$OUT/train_loop.log" "$OUT/latest_iter.txt" "$OUT/latest.state" "$OUT/latest_G.msgpack"

# ---- 1. codec soak A/B (serial vs pipelined; makes the rd_sweep ckpt) -
phase soak 2600 "$OUT/codec_soak_r05.log" bash tools/codec_soak_ab.sh 240 900
commit "round5 chip artifact: real-x265 codec soak, serial vs codec_pipeline A/B (overlap share in-log)" \
  "$OUT/codec_soak_r05.log"

# ---- 2. RD acceptance sweep through real x265 -------------------------
SOAK_CKPT=$(ls -t experiments/SelfC_codec_soak/models/*_G.msgpack 2>/dev/null | head -1)
if [ -n "${SOAK_CKPT:-}" ] && [ -f /tmp/synth_uvg/list.txt ]; then
  phase rd_sweep 2700 runs/rd_x265/rd_sweep.log python tools/rd_sweep.py \
    --out runs/rd_x265 --ckpt "$(realpath "$SOAK_CKPT")" --dataroot /tmp/synth_uvg
  cat /tmp/win5_rd_sweep.log >> runs/rd_x265/rd_sweep.log 2>/dev/null
  commit "round5: rate-distortion acceptance artifact — q-sweep through REAL libx265, golden-log format" \
    runs/rd_x265
else
  say "SKIP rd_sweep: ckpt=${SOAK_CKPT:-none}"
fi

# ---- 3. production-trainer profile re-measure -------------------------
phase profile 1300 /tmp/profile_window.log bash tools/profile_window.sh /tmp/jax_trace_r05
python tools/profile_step.py /tmp/jax_trace_r05 > "$OUT/profile_r05.txt" 2>&1 \
  || echo "[win5] profile_step failed" >> "$OUT/profile_r05.txt"
grep -E "iter:|wall_s" /tmp/profile_window.log | tail -4 >> "$OUT/profile_r05.txt" 2>/dev/null
commit "round5 chip artifact: production train-step profile re-measure after the dy-merged adjoint + persistent W-packing" \
  "$OUT/profile_r05.txt"

# ---- 4. precision delta, BOTH dtypes, on the committed checkpoint -----
phase precision 1500 "$OUT/precision_r05.log" python tools/precision_delta.py \
  --ckpt "$OUT/latest_G.msgpack" --val /tmp/synth_val_packed
cp -f /tmp/win5_precision.log "$OUT/precision_r05.log" 2>/dev/null
commit "round5 chip artifact: fp32-vs-bf16 eval precision on the iter-$IT checkpoint (both dtypes measured)" \
  "$OUT/precision_r05.log"

# ---- 5. streaming codec eval: batched vs serial at 1080p/T=100 --------
phase codec_batched 900 "$OUT/codec_batched.log" python tools/bench_codec_eval.py --mode batched --reps 2
cp -f /tmp/win5_codec_batched.log "$OUT/codec_batched.log" 2>/dev/null
phase codec_serial 700 "$OUT/codec_serial.log" python tools/bench_codec_eval.py --mode serial --reps 1
cp -f /tmp/win5_codec_serial.log "$OUT/codec_serial.log" 2>/dev/null
commit "round5 chip artifact: batched-vs-serial streaming codec eval at 1080p/T=100 through real x265" \
  "$OUT/codec_batched.log" "$OUT/codec_serial.log"

# ---- 6. NLL A/B (train both 5k variants on chip; evals deferred to CPU) -
phase nll 2900 "$OUT/nll_eval.log" bash tools/nll_compare.sh 5000 /tmp/synth_parity train
commit "round5 chip artifact: lambda_cond_prob (NLL) 5k-iter A/B training windows" \
  "$OUT/nll_eval.log"

# ---- 7. on-TPU kernel test lane --------------------------------------
SELFC_TPU_TEST_TPU=1 phase tpu_lane_run 800 "$OUT/tpu_lane.log" python -m pytest -m tpu -q
cp -f /tmp/win5_tpu_lane_run.log "$OUT/tpu_lane.log" 2>/dev/null
commit "round5 chip artifact: on-TPU kernel test lane refresh" "$OUT/tpu_lane.log"

say "window complete — trainer left PAUSED (chip free for driver bench)"
