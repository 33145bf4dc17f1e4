#!/bin/bash
# Round-3 TPU queue, part D: remaining long jobs, ordered so the
# comparison gauntlet (VERDICT #3/#4 acceptance) lands before the
# recognizer retrain (which only sharpens OCR quality, not the gauntlet's
# segmentation columns).
set -x
cd "$(dirname "$0")/.."

echo "=== D1. w64 reference-architecture retrain (RESUME from /tmp/seg_ckpt_w64_g512) ==="
timeout 10800 python scripts/train_synthetic_segmenter.py --width 64 \
    --epochs 40 --n 240 --eval-n 15 --out /tmp/seg_v3_w64.npz --resume \
    2>&1 | tail -30

echo "=== D2. comparison gauntlet: bundled vs v3 (all tiers incl scenarios) ==="
timeout 10800 python scripts/eval_gauntlet.py --n 25 \
    --variant w16_old=twinvoice_tpu/models/weights/segmenter_synth_w16.npz:16 \
    --variant w16_v3=/tmp/seg_v3_w16.npz:16 \
    --variant w16g384_v3=/tmp/seg_v3_w16_g384.npz:16:384 \
    --variant w64_old=twinvoice_tpu/models/weights/segmenter_synth_w64.npz:64 \
    --variant w64_v3=/tmp/seg_v3_w64.npz:64 \
    2>&1 | tail -40

echo "=== D3. jaxocr recognizer retrain (CJK charset, v3 fonts+warps) ==="
timeout 10800 python -m twinvoice_tpu.ocr.jaxocr.train 4000 /tmp/jaxocr_v3.npz \
    --cjk --cache=160 2>&1 | tail -25

echo "=== queue D done ==="
