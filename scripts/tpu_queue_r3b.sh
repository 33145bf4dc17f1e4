#!/bin/bash
# Round-3 TPU queue, part B: resume after the session restart killed part A
# during step 3. Steps 1-2 (w16@512, w16@384 retrains) completed; their
# outputs are /tmp/seg_v3_w16.npz and /tmp/seg_v3_w16_g384.npz.
set -x
cd "$(dirname "$0")/.."

echo "=== 3. w64 reference-architecture retrain (RESUME) ==="
timeout 14400 python scripts/train_synthetic_segmenter.py --width 64 \
    --epochs 40 --n 240 --eval-n 15 --out /tmp/seg_v3_w64.npz --resume \
    2>&1 | tail -30

echo "=== 4. jaxocr recognizer retrain (CJK charset, v3 fonts+warps) ==="
timeout 10800 python -m twinvoice_tpu.ocr.jaxocr.train 4000 /tmp/jaxocr_v3.npz \
    --cjk --cache=160 2>&1 | tail -25

echo "=== 5. comparison gauntlet: bundled vs v3 (all tiers incl scenarios) ==="
timeout 10800 python scripts/eval_gauntlet.py --n 25 \
    --variant w16_old=twinvoice_tpu/models/weights/segmenter_synth_w16.npz:16 \
    --variant w16_v3=/tmp/seg_v3_w16.npz:16 \
    --variant w16g384_v3=/tmp/seg_v3_w16_g384.npz:16:384 \
    --variant w64_old=twinvoice_tpu/models/weights/segmenter_synth_w64.npz:64 \
    --variant w64_v3=/tmp/seg_v3_w64.npz:64 \
    2>&1 | tail -40

echo "=== queue B done ==="
