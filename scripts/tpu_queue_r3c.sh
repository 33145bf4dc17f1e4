#!/bin/bash
# Round-3 TPU queue, part C: the five quick measurements (VERDICT items
# 2, 5, 6, 7, 8) moved AHEAD of the remaining long trainings so they are
# guaranteed to land within the round. Part D (trainings + gauntlet)
# chains after this.
set -x
cd "$(dirname "$0")/.."

echo "=== C1. NHWC mega-kernel probe + full w64 trunk path (VERDICT #2) ==="
timeout 3600 python scripts/nhwc_conv_probe.py 128 10 --trunk 2>&1 | tail -20

echo "=== C2. w64 int8 serving A/B with queue-depth-2 dispatch ==="
timeout 2400 python scripts/bench_int8_serving.py 128 8 2>&1 | tail -10

echo "=== C3. bulk extraction throughput (VERDICT #5) ==="
timeout 1800 python scripts/bench_bulk_extract.py 32 2>&1 | tail -15

echo "=== C4. streaming amortized 2-in-flight, w16@384 preset (VERDICT #7) ==="
timeout 1800 python scripts/bench_streaming.py 384 --w16 2>&1 | tail -15

echo "=== C5. train batch/remat sweep to the OOM edge (VERDICT #6) ==="
timeout 3600 python scripts/bench_train.py --sweep 2>&1 | tail -25

echo "=== C6. learned textness head: train + classical-vs-learned A/B (VERDICT #8) ==="
timeout 3600 python scripts/train_textness.py --steps 1500 --eval-n 30 2>&1 | tail -25

echo "=== queue C done ==="
