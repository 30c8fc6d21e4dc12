#!/bin/bash
# Soak the full production train stack on the real TPU (VERDICT r3 item 6):
# >=1000 steps at the headline config (256px council-4 batch 8, synthetic),
# with a SIGTERM mid-run and a --resume continuation. Verifies the graceful
# drain (checkpoint + exit 0), the resume fast-forward, and that the
# sustained loop rate stays within ~2% of the measured double-buffered rate
# (13.48 img/s, BASELINE.md loop table).
#
# Usage: bash tools/soak_run.sh [outdir]   (default /tmp/soak)
# Analysis afterwards: python tools/soak_report.py <outdir>/soak_256_council4
set -u
OUT=${1:-/tmp/soak}
CFG=configs/soak_256_council4.yaml
TOTAL=${SOAK_TOTAL:-1000}
# SIGTERM lands on PROGRESS, not wall time: leg 1 is killed once
# metrics.jsonl reports step >= SOAK_KILL_STEP, so compile-time variance
# (10-30 min through the dev tunnel) can neither fire the kill during
# compile nor let leg 1 finish before it.
KILL_STEP=${SOAK_KILL_STEP:-600}
KILL_TIMEOUT=${SOAK_KILL_TIMEOUT:-3600}   # safety: max seconds to wait

rm -rf "$OUT"
echo "=== leg 1: fresh run, SIGTERM at step >= ${KILL_STEP} ==="
python train.py --config "$CFG" --synthetic --max_steps "$TOTAL" \
    --output_path "$OUT" &
PID=$!
METRICS="$OUT/soak_256_council4/metrics.jsonl"
WAITED=0
while kill -0 "$PID" 2>/dev/null; do
    LAST=$(grep -o '"step": [0-9]*' "$METRICS" 2>/dev/null | tail -1 \
           | grep -o '[0-9]*' || true)
    if [ -n "${LAST:-}" ] && [ "$LAST" -ge "$KILL_STEP" ]; then
        echo "=== step $LAST >= $KILL_STEP: sending SIGTERM to $PID ==="
        kill -TERM "$PID"
        break
    fi
    if [ "$WAITED" -ge "$KILL_TIMEOUT" ]; then
        echo "=== kill timeout (${KILL_TIMEOUT}s) at step ${LAST:-none}: SIGTERM anyway ==="
        kill -TERM "$PID"
        break
    fi
    sleep 10; WAITED=$((WAITED + 10))
done
wait "$PID"; RC1=$?
echo "=== leg 1 exit code: $RC1 (graceful drain should be 0) ==="

# NOTE: --max_steps counts steps THIS RUN (train/loop.py: limit =
# max_steps + start_step), so leg 2 runs up to $TOTAL further steps after
# the resume point — the combined soak exceeds $TOTAL total steps.
echo "=== leg 2: resume, up to $TOTAL further steps ==="
python train.py --config "$CFG" --synthetic --max_steps "$TOTAL" \
    --output_path "$OUT" --resume
RC2=$?
echo "=== leg 2 exit code: $RC2 ==="
exit $(( RC1 || RC2 ))
