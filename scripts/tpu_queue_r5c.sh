#!/bin/bash
# Round-5 third measured queue (session 2) — runs AFTER v14 training
# (warm from v12, first run on the physically-calibrated dot tier)
# finishes. Serialized on the single chip; logs to /tmp/queue_r5c.log.
# The v14-vs-v12 promotion decision (stage C3) is manual; stages are
# runnable standalone.
set -x
cd "$(dirname "$0")/.."

echo "=== C1. v14 eval: standard + calibrated dot tiers ==="
timeout 2400 python scripts/eval_jaxocr_cjk.py /tmp/jaxocr_v14.npz 25 2>&1 | tail -2
timeout 2400 python scripts/eval_jaxocr_cjk.py /tmp/jaxocr_v14.npz 25 --dot 2>&1 | tail -2

echo "=== C2. v14 GT-crop dot diagnostic (segmenter excluded) ==="
timeout 1200 python scripts/diag_dot_e2e.py 25 /tmp/jaxocr_v14.npz 2>&1 | tail -6

echo "=== C3. [manual] v14 promotion decision ==="
echo "=== queue r5c done (decision point) ==="
