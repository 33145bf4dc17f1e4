#!/bin/bash
# Round-4 TPU queue: supersedes tpu_queue_r3h.sh (same deferred r3
# measurements, VERDICT-r3-ordered, plus the new Pallas TPU validation
# gate, the streaming spread, and the w64 full retrain at the tail).
# Self-gating on jax.devices(); logs to /tmp/queue_r4.log.
set -x
cd "$(dirname "$0")/.."

echo "=== R0. wait for TPU recovery ==="
for i in $(seq 1 720); do
  if timeout 180 python -c "import jax; assert jax.devices()" 2>/dev/null; then
    echo "TPU back after $i probes"; break
  fi
  sleep 60
done

echo "=== R1. Pallas TPU validation gate (VERDICT #7) ==="
timeout 3600 python scripts/pallas_tpu_gate.py 2>&1 | tail -10

echo "=== R2. rolling-carry kernels, HBM-hygienic probe (VERDICT #2b) ==="
timeout 3600 python scripts/nhwc_conv_probe.py 128 10 --trunk 2>&1 | tail -15

echo "=== R3. bench.py with the promoted v4 flagship (fixed protocol) ==="
timeout 1200 python bench.py 2>&1 | tail -2

echo "=== R4. bulk extraction with gray H2D (VERDICT #4) ==="
timeout 1800 python scripts/bench_bulk_extract.py 32 2>&1 | tail -15

echo "=== R5. Mosaic per-grid-step overhead constant ==="
timeout 1800 python scripts/pallas_step_overhead.py 2>&1 | tail -8

echo "=== R6. streaming w16@384 n=5 spread (VERDICT #6) ==="
timeout 1800 python scripts/bench_streaming.py 384 --w16 --spread 2>&1 | tail -8

echo "=== R7. comparison gauntlet n=25: old (from git) vs v4 (VERDICT #1) ==="
timeout 10800 python scripts/eval_gauntlet.py --n 25 \
    --variant w16_old=/tmp/seg_old_w16.npz:16 \
    --variant w16_v4=/tmp/seg_v4_w16.npz:16 \
    --variant w16g384_old=/tmp/seg_old_w16_g384.npz:16:384 \
    --variant w16g384_v4=/tmp/seg_v4_w16_g384.npz:16:384 \
    --variant w64_old=/tmp/seg_old_w64.npz:64 \
    --variant w64_v4=/tmp/seg_v4_w64.npz:64 \
    2>&1 | tail -50

echo "=== R8. train sweep incl. remat-from-bs16 (VERDICT r2 #6 leftover) ==="
timeout 3600 python scripts/bench_train.py --sweep 2>&1 | tail -14

echo "=== R8b. recognizer v4 retrain: t64 arch + confusion-weighted sampling (VERDICT #5) ==="
timeout 7200 python -m twinvoice_tpu.ocr.jaxocr.train 9000 /tmp/jaxocr_v4_t64.npz \
    --cjk --cache=400 2>&1 | tail -20

echo "=== R8c. recognizer v4 eval (warped ASCII/CJK eval) ==="
timeout 1800 python scripts/eval_jaxocr_cjk.py /tmp/jaxocr_v4_t64.npz 2>&1 | tail -12

echo "=== R9. w64 full retrain: 70 epochs = through the T0=10/Tmult=2 cycle (VERDICT #2a) ==="
timeout 21600 python scripts/train_synthetic_segmenter.py \
    --width 64 --epochs 70 --out /tmp/seg_v5_w64.npz --eval-n 25 2>&1 | tail -40

echo "=== R10. (opportunistic) hard-tier ceiling experiment: w16 @ severity 0.8 ==="
# n=25 shows BOTH v4 models at hard-tier box-hit 0.933 (target >=0.95) —
# a shared augmentation ceiling, not a preset regression. Candidate only;
# no auto-promotion (compare its n=25 hard row to 0.933 first).
timeout 14400 python scripts/train_synthetic_segmenter.py \
    --width 16 --epochs 70 --severity 0.8 \
    --out /tmp/seg_v5_w16_sev08.npz --eval-n 25 2>&1 | tail -40

echo "=== queue r4 done ==="
