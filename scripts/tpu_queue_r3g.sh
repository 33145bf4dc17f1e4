#!/bin/bash
# Round-3 TPU queue, part G: measurements for the second wave of round-3
# work — gray-H2D bulk path, fixed rolling-carry probe, per-step overhead
# constant, one more remat attempt at small batch.
set -x
cd "$(dirname "$0")/.."

echo "=== G1. bulk extraction with gray H2D (VERDICT #5) ==="
timeout 1800 python scripts/bench_bulk_extract.py 32 2>&1 | tail -15

echo "=== G2. rolling-carry kernels, HBM-hygienic probe (VERDICT #2) ==="
timeout 3600 python scripts/nhwc_conv_probe.py 128 10 --trunk 2>&1 | tail -15

echo "=== G3. Mosaic per-grid-step overhead constant ==="
timeout 1800 python scripts/pallas_step_overhead.py 2>&1 | tail -8

echo "=== G4. train sweep incl. remat-from-bs16 (VERDICT #6) ==="
timeout 3600 python scripts/bench_train.py --sweep 2>&1 | tail -14

echo "=== G5. bench.py sanity after weight promotions ==="
timeout 1200 python bench.py 2>&1 | tail -2

echo "=== queue G done ==="
