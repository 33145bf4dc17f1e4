#!/bin/bash
# Round-3 TPU queue, part F: retrain all bundled segmenters on the
# ink-anchored ground-truth convention (v4 weights), then the comparison
# gauntlet. w64 runs 30 epochs so the cosine warm-restart at epoch 31
# cannot wreck the tail (it cost w64_v3 its convergence in part D).
set -x
cd "$(dirname "$0")/.."

echo "=== F1. w16@512 flagship retrain (ink-anchored GT) ==="
timeout 10800 python scripts/train_synthetic_segmenter.py --width 16 \
    --epochs 40 --n 240 --eval-n 10 --out /tmp/seg_v4_w16.npz \
    2>&1 | tail -15

echo "=== F2. w16@384 streaming preset retrain (ink-anchored GT) ==="
timeout 10800 python scripts/train_synthetic_segmenter.py --width 16 --grid 384 \
    --epochs 40 --n 240 --eval-n 10 --out /tmp/seg_v4_w16_g384.npz \
    2>&1 | tail -15

echo "=== F3. w64 retrain, 30 epochs (ink-anchored GT) ==="
timeout 10800 python scripts/train_synthetic_segmenter.py --width 64 \
    --epochs 30 --n 240 --eval-n 10 --out /tmp/seg_v4_w64.npz \
    2>&1 | tail -15

echo "=== F4. comparison gauntlet: old bundled vs v4 (ink-anchored eval) ==="
timeout 10800 python scripts/eval_gauntlet.py --n 25 \
    --variant w16_old=twinvoice_tpu/models/weights/segmenter_synth_w16.npz:16 \
    --variant w16_v4=/tmp/seg_v4_w16.npz:16 \
    --variant w16g384_v4=/tmp/seg_v4_w16_g384.npz:16:384 \
    --variant w64_old=twinvoice_tpu/models/weights/segmenter_synth_w64.npz:64 \
    --variant w64_v4=/tmp/seg_v4_w64.npz:64 \
    2>&1 | tail -40

echo "=== queue F done ==="
