#!/bin/bash
# Round-5 second measured queue — runs AFTER v12 (dot-scale curriculum)
# training finishes. Serialized on the single chip; logs to
# /tmp/queue_r5b.log. Promotion decision for v12 happens after B1/B2
# (manual), so stages are runnable standalone.
set -x
cd "$(dirname "$0")/.."

echo "=== B1. v12 eval: standard + dot-v2 tiers (VERDICT #1/#2) ==="
timeout 2400 python scripts/eval_jaxocr_cjk.py /tmp/jaxocr_v12.npz 25 2>&1 | tail -2
timeout 2400 python scripts/eval_jaxocr_cjk.py /tmp/jaxocr_v12.npz 25 --dot 2>&1 | tail -2

echo "=== B2. v12 GT-crop dot diagnostic (segmenter excluded) ==="
timeout 1200 python scripts/diag_dot_e2e.py 25 /tmp/jaxocr_v12.npz 2>&1 | tail -6

echo "=== B3. [manual] v12 promotion decision ==="

echo "=== B4. e2e held-out n=25, cascade, solid + dot (VERDICT #1/#8) ==="
timeout 3600 python scripts/eval_e2e_heldout.py 25 --recognizer /tmp/jaxocr_v12.npz 2>&1 | tail -4
timeout 3600 python scripts/eval_e2e_heldout.py 25 --dot --recognizer /tmp/jaxocr_v12.npz 2>&1 | tail -4

echo "=== B5. segmenter gauntlet n=25 incl. dot-print tiers (VERDICT #7) ==="
timeout 10800 python scripts/eval_gauntlet.py --n 25 2>&1 | tail -20

echo "=== B6. bench.py (ADVICE r5 #1: reconcile the serial figure) ==="
timeout 1200 python bench.py 2>&1 | tail -2

echo "=== B7. bulk extraction 32 with cascade decode ==="
timeout 1800 python scripts/bench_bulk_extract.py 32 2>&1 | tail -8

echo "=== B8. streaming n=5 spread ==="
timeout 1800 python scripts/bench_streaming.py 384 --w16 --spread 2>&1 | tail -8

echo "=== B9. BN fast_norm A/B (VERDICT weak #6 lever) ==="
timeout 3600 python scripts/bench_train.py 6 --fastnorm 2>&1 | tail -6

echo "=== queue r5b done ==="
