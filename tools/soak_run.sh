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
KILL_AFTER=${SOAK_KILL_AFTER:-900}   # seconds into leg 1 (past compile)

rm -rf "$OUT"
echo "=== leg 1: fresh run, SIGTERM after ${KILL_AFTER}s ==="
python train.py --config "$CFG" --synthetic --max_steps "$TOTAL" \
    --output_path "$OUT" &
PID=$!
sleep "$KILL_AFTER"
if kill -0 "$PID" 2>/dev/null; then
    echo "=== sending SIGTERM to $PID ==="
    kill -TERM "$PID"
fi
wait "$PID"; RC1=$?
echo "=== leg 1 exit code: $RC1 (graceful drain should be 0) ==="

echo "=== leg 2: resume to $TOTAL steps ==="
python train.py --config "$CFG" --synthetic --max_steps "$TOTAL" \
    --output_path "$OUT" --resume
RC2=$?
echo "=== leg 2 exit code: $RC2 ==="
exit $(( RC1 || RC2 ))
