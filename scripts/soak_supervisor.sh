#!/bin/bash
# Relaunch train_soak.py until it completes: this environment's TPU worker
# sporadically crashes (killing the whole client process), and every soak
# stage is process-level resumable — so the robust unit of retry is the
# PROCESS, not the in-process retry loop.
#
#   rc 0  -> done (PASS)
#   rc 2  -> done but the direction liveliness gate failed: deterministic,
#            do NOT relaunch
#   other -> crash: relaunch after a cool-down (a crashed worker can take
#            minutes to restart)
#
# Usage: SOAK_DEADLINE_TS=... bash scripts/soak_supervisor.sh <workdir> [ct] [shape]
set -u
cd "$(dirname "$0")/.."
DEADLINE="${SOAK_DEADLINE_TS:-0}"
for i in $(seq 1 30); do
    python scripts/train_soak.py "$@"
    rc=$?
    if [ "$rc" -eq 0 ] || [ "$rc" -eq 2 ]; then
        echo "supervisor: soak finished rc=$rc after $i attempt(s)"
        exit "$rc"
    fi
    now=$(date +%s)
    if [ "$DEADLINE" != "0" ] && [ "$now" -gt "$DEADLINE" ]; then
        echo "supervisor: deadline passed (last rc=$rc)"
        exit "$rc"
    fi
    echo "supervisor: soak crashed rc=$rc; relaunching in 120s (attempt $i)"
    sleep 120
done
echo "supervisor: attempt budget exhausted"
exit 1
