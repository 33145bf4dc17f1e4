#!/bin/bash
# Round-3 TPU queue, part H: runs when the TPU relay recovers from the
# 20:30 outage. Corrected comparison gauntlet (the old weights now come
# from git history — the bundled files were promoted to v4 mid-F4) plus
# everything queue G was going to measure.
set -x
cd "$(dirname "$0")/.."

echo "=== H0. wait for TPU recovery ==="
for i in $(seq 1 240); do
  if timeout 180 python -c "import jax; assert jax.devices()" 2>/dev/null; then
    echo "TPU back after $i probes"; break
  fi
  sleep 60
done

echo "=== H1. comparison gauntlet: old (from git) vs v4, ink-anchored eval ==="
timeout 10800 python scripts/eval_gauntlet.py --n 25 \
    --variant w16_old=/tmp/seg_old_w16.npz:16 \
    --variant w16_v4=/tmp/seg_v4_w16.npz:16 \
    --variant w16g384_old=/tmp/seg_old_w16_g384.npz:16:384 \
    --variant w16g384_v4=/tmp/seg_v4_w16_g384.npz:16:384 \
    --variant w64_old=/tmp/seg_old_w64.npz:64 \
    --variant w64_v4=/tmp/seg_v4_w64.npz:64 \
    2>&1 | tail -50

echo "=== H2. bulk extraction with gray H2D (VERDICT #5) ==="
timeout 1800 python scripts/bench_bulk_extract.py 32 2>&1 | tail -15

echo "=== H3. rolling-carry kernels, HBM-hygienic probe (VERDICT #2) ==="
timeout 3600 python scripts/nhwc_conv_probe.py 128 10 --trunk 2>&1 | tail -15

echo "=== H4. Mosaic per-grid-step overhead constant ==="
timeout 1800 python scripts/pallas_step_overhead.py 2>&1 | tail -8

echo "=== H5. train sweep incl. remat-from-bs16 (VERDICT #6) ==="
timeout 3600 python scripts/bench_train.py --sweep 2>&1 | tail -14

echo "=== H6. bench.py with the promoted v4 flagship ==="
timeout 1200 python bench.py 2>&1 | tail -2

echo "=== queue H done ==="
