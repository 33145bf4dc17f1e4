#!/bin/bash
# Round-2 TPU job chain — run AFTER the w64 trainer releases the chip.
# Each step is serialized (the TPU is exclusive-access on this box).
set -x
cd "$(dirname "$0")/.."

echo "=== 1. Pallas conv formulation probe (512^2 x 64ch int8) ==="
timeout 1200 python scripts/pallas_conv_probe.py 512 128 5

echo "=== 2. Whole-graph A/B: bf16 vs int8-xla(+head) vs int8-pallas ==="
timeout 2400 python scripts/bench_int8_serving.py 128 10

echo "=== 3. w16 variant with int8+pallas (the >1000 img/s config) ==="
timeout 1800 python scripts/bench_int8_serving.py 128 10 --w16

echo "=== 4. Train w16@384 streaming-preset variant ==="
timeout 5400 python scripts/train_synthetic_segmenter.py --width 16 --grid 384 \
    --epochs 40 --n 240 --eval-n 25

echo "=== 5. Gauntlet across all bundled variants ==="
timeout 3600 python scripts/eval_gauntlet.py --n 25

echo "=== 6. Training MFU (VERDICT r1 #9) ==="
timeout 2400 python scripts/bench_train.py 6

echo "=== 7. Streaming p50 (batch-1) at 512 and 384 ==="
timeout 1200 python scripts/bench_streaming.py 512
timeout 1200 python scripts/bench_streaming.py 384
