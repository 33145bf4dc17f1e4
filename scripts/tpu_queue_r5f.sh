#!/bin/bash
# Round-5 queue F (session 4) — waits for v16 training (40k warm from
# soup15, dot=0.4 dothard=0.7) to finish, then runs the promotion-feed
# evals: v16 std+dot (n=2560), soup16 = avg(soup15, v16) std+dot, and
# e2e (solid + calibrated dot) on soup16. Logs to /tmp/queue_r5f.log.
set -x
cd "$(dirname "$0")/.."

echo "=== F0. wait for v16 training ==="
while kill -0 "$(cat /tmp/v16.pid)" 2>/dev/null; do sleep 60; done
tail -3 /tmp/v16_train.log

echo "=== F1. v16 eval: standard + dot v3 (n=2560) ==="
timeout 3000 python scripts/eval_jaxocr_cjk.py /tmp/jaxocr_v16.npz 40 2>&1 | grep "^{"
timeout 3000 python scripts/eval_jaxocr_cjk.py /tmp/jaxocr_v16.npz 40 --dot 2>&1 | grep "^{"

echo "=== F2. soup16 = avg(soup15, v16) + eval ==="
python - <<'EOF'
import numpy as np
a = np.load('/tmp/jaxocr_soup15.npz', allow_pickle=True)
b = np.load('/tmp/jaxocr_v16.npz', allow_pickle=True)
out = {}
for k in a.files:
    x, y = a[k], b[k]
    if x.dtype.kind == 'f' and x.shape == y.shape:
        out[k] = ((x.astype(np.float64) + y.astype(np.float64)) / 2).astype(x.dtype)
    else:
        out[k] = x
np.savez_compressed('/tmp/jaxocr_soup16.npz', **out)
print('soup16 saved')
EOF
timeout 3000 python scripts/eval_jaxocr_cjk.py /tmp/jaxocr_soup16.npz 40 2>&1 | grep "^{"
timeout 3000 python scripts/eval_jaxocr_cjk.py /tmp/jaxocr_soup16.npz 40 --dot 2>&1 | grep "^{"

echo "=== F3. e2e on soup16 (solid + dot v3, n=25, cascade) ==="
timeout 2400 python scripts/eval_e2e_heldout.py 25 --recognizer /tmp/jaxocr_soup16.npz 2>&1 | grep "^{"
timeout 2400 python scripts/eval_e2e_heldout.py 25 --recognizer /tmp/jaxocr_soup16.npz --dot 2>&1 | grep "^{"

echo "=== queue r5f done ==="
