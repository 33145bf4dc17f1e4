#!/bin/bash
# Promote the ink-anchored (v4) segmenter retrains into the bundled
# weights, after the F4 comparison gauntlet has been reviewed.
# Usage: bash scripts/promote_v4.sh [w16] [w16g384] [w64]
set -ex
cd "$(dirname "$0")/.."
W=twinvoice_tpu/models/weights
for v in "$@"; do
  case "$v" in
    w16)     cp /tmp/seg_v4_w16.npz      $W/segmenter_synth_w16.npz ;;
    w16g384) cp /tmp/seg_v4_w16_g384.npz $W/segmenter_synth_w16_g384.npz ;;
    w64)     cp /tmp/seg_v4_w64.npz      $W/segmenter_synth_w64.npz ;;
    *) echo "unknown variant $v"; exit 1 ;;
  esac
done
ls -la $W
