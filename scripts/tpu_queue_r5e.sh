#!/bin/bash
# Round-5 end-of-round measured queue — runs AFTER the recognizer
# promotion decision (queue r5d), on a quiet box, serialized on the
# single chip. Covers VERDICT r4 #7 (segmenter dot-print gauntlet row),
# #9 (state-of-record benches) and ADVICE r4 #1 (canonical serial
# figure). Logs to /tmp/queue_r5e.log.
set -x
cd "$(dirname "$0")/.."

echo "=== E1. segmenter gauntlet n=25 incl. dot-print tiers (VERDICT #7) ==="
timeout 10800 python scripts/eval_gauntlet.py --n 25 2>&1 | tail -24

echo "=== E2. bench.py x2 (ADVICE #1: canonical serial figure) ==="
timeout 1800 python bench.py 2>&1 | tail -2
timeout 1800 python bench.py 2>&1 | tail -2

echo "=== E3. bulk extraction 32 (cascade decode, promoted weights) ==="
timeout 1800 python scripts/bench_bulk_extract.py 32 2>&1 | tail -8

echo "=== E4. streaming n=5 spread ==="
timeout 1800 python scripts/bench_streaming.py 384 --w16 --spread 2>&1 | tail -8

echo "=== E5. BN fast_norm A/B (VERDICT weak #6 lever) ==="
timeout 3600 python scripts/bench_train.py 6 2>&1 | tail -6
timeout 3600 python scripts/bench_train.py 6 --fastnorm 2>&1 | tail -6

echo "=== queue r5e done ==="
