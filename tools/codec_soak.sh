#!/bin/bash
# Sustained on-chip codec-training window (VERDICT r3 item 4): run the
# compression recipe (train_compression_soak.yml — reference
# train_compression.yml semantics, REAL x265 codec span) for a bounded
# wall-clock window, then report iterations reached, non-finite skips and
# the host-codec overlap share. The caller bounds total time (timeout);
# this script stops the trainer gracefully short of that.
#
#   bash tools/codec_soak.sh [SECONDS=1200]
set -u
cd /root/repo
SECS=${1:-1200}
EXP=experiments/SelfC_codec_soak
CFG=selfc_tpu/configs/train/train_compression_soak.yml

# resume if a prior soak window left state behind
LATEST=$(ls "$EXP"/training_state/*.state 2>/dev/null \
  | sed 's,.*/,,;s,\.state,,' | grep -E '^[0-9]+$' | sort -rn | head -1)
RUNCFG="$CFG"
if [ -n "${LATEST:-}" ] && [ -f "$EXP/models/${LATEST}_G.msgpack" ]; then
  RUNCFG=/tmp/codec_soak_resume.yml
  python - "$CFG" "$EXP/training_state/$LATEST.state" "$RUNCFG" <<'EOF'
import sys, yaml
base, state, out = sys.argv[1:4]
with open(base) as f:
    opt = yaml.safe_load(f)
opt["path"]["resume_state"] = state
with open(out, "w") as f:
    yaml.safe_dump(opt, f)
EOF
  echo "[soak] resuming from iter $LATEST"
fi

PYTHONPATH=/root/repo:/root/.axon_site \
JAX_COMPILATION_CACHE_DIR=/tmp/jax_ccache \
JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=2 \
  python train.py -opt "$RUNCFG" &
TPID=$!
echo "$TPID" > /tmp/codec_soak.pid
END=$(( $(date +%s) + SECS ))
while kill -0 "$TPID" 2>/dev/null && [ "$(date +%s)" -lt "$END" ]; do
  sleep 10
done
if kill -0 "$TPID" 2>/dev/null; then
  echo "[soak] window over; SIGTERM (graceful checkpoint)"
  kill -TERM "$TPID" 2>/dev/null
  for _ in $(seq 1 60); do kill -0 "$TPID" 2>/dev/null || break; sleep 3; done
  kill -0 "$TPID" 2>/dev/null && kill -9 "$TPID" 2>/dev/null
fi
wait "$TPID" 2>/dev/null
NEWEST=$(ls "$EXP"/training_state/*.state 2>/dev/null \
  | sed 's,.*/,,;s,\.state,,' | grep -E '^[0-9]+$' | sort -rn | head -1)
echo "[soak] done; newest checkpoint iter: ${NEWEST:-none}"
LOG=$(ls -t "$EXP"/train_*.log 2>/dev/null | head -1)
if [ -n "${LOG:-}" ]; then
  SKIPS=$(grep -c "non-finite" "$LOG" 2>/dev/null || echo 0)
  echo "[soak] non-finite guard skips in log: $SKIPS"
  echo "[soak] last train lines:"
  grep "<epoch:" "$LOG" | tail -5
fi
