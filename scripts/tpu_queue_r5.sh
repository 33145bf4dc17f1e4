#!/bin/bash
# Round-5 measured queue — runs AFTER the recognizer capacity A/B training
# (v9 + v8w) finishes. Serialized on the single chip; logs to
# /tmp/queue_r5.log. Promotion decisions happen between stages (manual),
# so each stage is also runnable standalone.
set -x
cd "$(dirname "$0")/.."

echo "=== R1. wide-trunk A/B eval: standard + dot tiers (VERDICT #1) ==="
timeout 2400 python scripts/eval_jaxocr_cjk.py /tmp/jaxocr_v8w.npz 25 2>&1 | tail -2
timeout 2400 python scripts/eval_jaxocr_cjk.py /tmp/jaxocr_v8w.npz 25 --dot 2>&1 | tail -2

echo "=== R2. [manual] recognizer promotion decision ==="

echo "=== R3. segmenter gauntlet n=25 incl. the new dot-print tiers (VERDICT #7) ==="
timeout 10800 python scripts/eval_gauntlet.py --n 25 2>&1 | tail -20

echo "=== R4. e2e held-out n=25, cascade decode (served == published), solid + dot ==="
timeout 3600 python scripts/eval_e2e_heldout.py 25 2>&1 | tail -6
timeout 3600 python scripts/eval_e2e_heldout.py 25 --dot 2>&1 | tail -6

echo "=== R5. bench.py (ADVICE r4 #1: confirm the serial figure) ==="
timeout 1200 python bench.py 2>&1 | tail -2

echo "=== R6. bulk extraction 32 with cascade decode on ==="
timeout 1800 python scripts/bench_bulk_extract.py 32 2>&1 | tail -8

echo "=== R7. streaming n=5 spread (VERDICT weak #7 discipline) ==="
timeout 1800 python scripts/bench_streaming.py 384 --w16 --spread 2>&1 | tail -8

echo "=== R8. BN fast_norm A/B (VERDICT weak #6 lever) ==="
timeout 3600 python scripts/bench_train.py 6 --fastnorm 2>&1 | tail -6

echo "=== queue r5 done ==="
