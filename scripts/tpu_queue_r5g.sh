#!/bin/bash
# Round-5 FINAL measured queue (session 5) — the box restarted after
# session 4 and wiped /tmp (v14/v15/soup15/v16 weights lost; the
# promoted recognizer remains v12, the last committed lineage).
# This queue re-runs the end-of-round measurements in
# driver-artifact-priority order on the quiet chip:
#   G1 bench.py x2          (ADVICE r4 #1: canonical serial figure)
#   G2 bulk extraction      (VERDICT #9 state-of-record)
#   G3 streaming n=5 spread (VERDICT weak #7 protocol)
#   G4 segmenter gauntlet n=25 incl dot tiers (VERDICT #7)
#   G5 BN fast_norm train A/B (VERDICT weak #6 lever)
# Logs to /tmp/queue_r5g.log.
set -x
cd "$(dirname "$0")/.."

echo "=== G1. bench.py x2 (canonical serial figure) ==="
timeout 1800 python bench.py 2>&1 | tail -2
timeout 1800 python bench.py 2>&1 | tail -2

echo "=== G2. bulk extraction 32 (cascade decode, promoted v12) ==="
timeout 1800 python scripts/bench_bulk_extract.py 32 2>&1 | tail -8

echo "=== G3. streaming n=5 spread ==="
timeout 1800 python scripts/bench_streaming.py 384 --w16 --spread 2>&1 | tail -8

echo "=== G4. segmenter gauntlet n=25 incl. dot-print tiers ==="
timeout 7200 python scripts/eval_gauntlet.py --n 25 2>&1 | tail -30

echo "=== G5. BN fast_norm A/B ==="
timeout 1800 python scripts/bench_train.py 6 2>&1 | tail -6
timeout 1800 python scripts/bench_train.py 6 --fastnorm 2>&1 | tail -6

echo "=== queue r5g done ==="
