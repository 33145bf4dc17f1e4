#!/bin/bash
# Round-3 TPU queue, part E: measurements for the work landed while the
# part-D trainings held the chip — bulk-extraction fixes, rolling-carry
# mega-kernels, train sweep retry, 3-way textness A/B.
set -x
cd "$(dirname "$0")/.."

echo "=== E1. bulk extraction after mask-fetch + QR fixes (VERDICT #5) ==="
timeout 1800 python scripts/bench_bulk_extract.py 32 2>&1 | tail -25

echo "=== E2. rolling-carry NHWC mega-kernels + full w64 trunk (VERDICT #2) ==="
timeout 3600 python scripts/nhwc_conv_probe.py 128 10 --trunk 2>&1 | tail -20

echo "=== E3. w64 int8 serving A/B (queue-depth-2) ==="
timeout 2400 python scripts/bench_int8_serving.py 128 8 2>&1 | tail -10

echo "=== E4. train batch/remat sweep with flake retry (VERDICT #6) ==="
timeout 3600 python scripts/bench_train.py --sweep 2>&1 | tail -25

echo "=== E5. DP scaling curve on virtual CPU devices (VERDICT #6) ==="
timeout 1800 python scripts/bench_train.py --dp-sweep 2>&1 | tail -10

echo "=== E6. textness 3-way A/B: classical vs learned vs hybrid (VERDICT #8) ==="
timeout 2400 python scripts/train_textness.py --steps 0 --eval-n 30 2>&1 | tail -15

echo "=== E7. flagship bench.py sanity ==="
timeout 1200 python bench.py 2>&1 | tail -3

echo "=== queue E done ==="
