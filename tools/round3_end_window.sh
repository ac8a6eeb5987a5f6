#!/bin/bash
# Round-3 end-of-round chip window (docs/ROUND3_PLAN.md). Run AFTER the
# 400k trainer is stopped and no python holds the TPU. Each phase is
# independently timeout-bounded; output accumulates in runs/400k/.
set -u
cd /root/repo
OUT=runs/400k
mkdir -p "$OUT"
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_ccache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=2

run() {  # run <tag> <timeout_s> <cmd...>
  local tag=$1 to=$2; shift 2
  echo "=== $tag ($(date -u +%H:%M:%S)) ===" | tee -a "$OUT/end_window.log"
  timeout "$to" "$@" 2>&1 | tee "$OUT/$tag.log" | tail -25
  echo "=== $tag exit=$? ===" | tee -a "$OUT/end_window.log"
}

case "${1:-all}" in
  tpu-lane)
    SELFC_TPU_TEST_TPU=1 run tpu_lane 1500 python -m pytest -m tpu -q ;;
  ablate)
    run train_ablate 1800 python tools/bench_train_parts.py --mp --ablate ;;
  codec-eval)
    run codec_serial 1500 python tools/bench_codec_eval.py --mode serial --reps 1
    run codec_batched 1500 python tools/bench_codec_eval.py --mode batched --reps 2 ;;
  deform)
    run deform 900 python tools/bench_deform.py ;;
  bench)
    run bench 900 python bench.py ;;
  *)
    echo "phases: tpu-lane ablate codec-eval deform bench" ;;
esac
