#!/bin/bash
# Round-2 TPU job chain — the chip is exclusive-access on this box, so run
# these serialized. Items already measured this round are marked [done]
# with their results recorded in docs/PERFORMANCE.md.
set -x
cd "$(dirname "$0")/.."

# [done] w64 A/B (bf16 374.7 / int8+pallas-head 427.8 / int8+xla-head 483.4)
# timeout 2400 python scripts/bench_int8_serving.py 128 10
# [done] w16 A/B (bf16 1790.4 / int8 1731.0 — int8 loses at w16)
# timeout 1800 python scripts/bench_int8_serving.py 128 10 --w16
# [done] train MFU (fp32 6.7% / bf16-bs4 8.2% / bf16-bs16 21.8%)
# timeout 2400 python scripts/bench_train.py 6
# [done] streaming p50 (relay-jitter-bound 36-57 ms; target unmet here)
# timeout 1200 python scripts/bench_streaming.py 512 --w16

echo "=== 1. w16@384 streaming-preset variant (trained at its serving grid) ==="
timeout 9000 python scripts/train_synthetic_segmenter.py --width 16 --grid 384 \
    --epochs 40 --n 240 --eval-n 25

echo "=== 2. Frame-format Pallas kernel probe (lowering + per-kernel ms) ==="
timeout 1800 python scripts/pallas_conv_probe.py 512 128 5

echo "=== 3. w64 flagship (resume the interrupted run) ==="
timeout 9000 python scripts/train_synthetic_segmenter.py --width 64 \
    --n 240 --eval-n 25 --resume

echo "=== 4. Quality gauntlet across all bundled variants, bf16 + int8 ==="
timeout 7200 python scripts/eval_gauntlet.py --n 25 --int8 --e2e

echo "=== 5. Whole-graph A/B incl. the Pallas trunk (if probe was healthy) ==="
timeout 3000 python scripts/bench_int8_serving.py 128 10 --pallas
