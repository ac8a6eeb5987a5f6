#!/bin/bash
# Round-5 tail: reprioritized remainder of the chip window after the
# rd_sweep OOM + the adjoint-regression discovery. Waits for the window
# script to finish its codec_serial phase, stops it before the NLL phase
# can claim the chip (NLL dropped for time — see runs/400k/README.md),
# then runs: on-TPU kernel lane -> rd_sweep retry -> BWD_MERGED=0 profile
# A/B, committing each artifact.
#
#   setsid nohup bash tools/round5_tail.sh > /tmp/round5_tail.log 2>&1 &
set -u
cd /root/repo
OUT=runs/400k
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_ccache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=2

say() { echo "[tail5] $(date -u +%H:%M:%S) $*"; }
commit() {
  local msg=$1; shift
  git reset -q; git add -f "$@" 2>/dev/null
  git commit -q -m "$msg" 2>/dev/null && say "committed: $msg" || say "nothing to commit for: $msg"
}

# ---- wait for codec_serial to finish, then stop the window script -----
for _ in $(seq 1 400); do
  grep -q "phase codec_serial exit" /tmp/round5_window.log 2>/dev/null && break
  sleep 10
done
WPID=$(ps aux | grep -a "[r]ound5_chip_window" | awk '{print $2}' | head -1)
if [ -n "${WPID:-}" ]; then
  say "stopping window script $WPID before nll phase"
  kill "$WPID" 2>/dev/null
  sleep 3
  # kill any orphaned nll trainer it may have just launched
  for p in $(ps aux | grep -a "[t]rain.py -opt /tmp/nll_" | awk '{print $2}'); do
    kill -TERM "$p" 2>/dev/null
  done
fi
# commit whatever the window produced for codec bench (its commit step may
# have been skipped if we killed between phases)
commit "round5 chip artifact: batched-vs-serial streaming codec eval at 1080p/T=100 (real x265)" \
  "$OUT/codec_batched.log" "$OUT/codec_serial.log" "$OUT/precision_r05.log"

# ---- 1. on-TPU kernel lane (validates a6ef787 chain numerics on chip) --
SELFC_TPU_TEST_TPU=1 timeout 900 python -m pytest -m tpu -q > "$OUT/tpu_lane.log" 2>&1
echo "[tail5] exit=$?" >> "$OUT/tpu_lane.log"
commit "round5 chip artifact: on-TPU kernel test lane refresh" "$OUT/tpu_lane.log"

# ---- 2. rd_sweep retry (seg_batch 2 halves the encode-chunk puts) ------
SOAK_CKPT=$(ls -t experiments/SelfC_codec_soak/models/*_G.msgpack 2>/dev/null | head -1)
if [ -n "${SOAK_CKPT:-}" ]; then
  timeout 3000 python tools/rd_sweep.py --out runs/rd_x265 \
    --ckpt "$(realpath "$SOAK_CKPT")" --dataroot /tmp/synth_uvg \
    --seg-batch 2 > /tmp/rd_retry.log 2>&1
  RC=$?
  echo "[tail5] exit=$RC" >> runs/rd_x265/rd_sweep.log
  commit "round5: rate-distortion acceptance artifact retry — q-sweep through REAL libx265 (seg_batch 2)" \
    runs/rd_x265
fi

# ---- 3. BWD_MERGED=0 profile A/B (pins the adjoint regression) ---------
SELFC_TPU_PALLAS_BWD_MERGED=0 timeout 1500 bash tools/profile_window.sh /tmp/jax_trace_merged0 \
  > /tmp/profile_merged0.log 2>&1
python tools/profile_step.py --parse-only --out /tmp/jax_trace_merged0 \
  > /tmp/merged0_parse.txt 2>&1
{ echo ""; echo "== A/B: SELFC_TPU_PALLAS_BWD_MERGED=0 (the round-4 adjoint path) =="; \
  grep -E "total device-op time|jit__train_step" /tmp/merged0_parse.txt; } >> "$OUT/profile_r05.txt"
commit "round5 chip artifact: BWD_MERGED=0 adjoint A/B appended to profile_r05" "$OUT/profile_r05.txt"
say "tail complete"
