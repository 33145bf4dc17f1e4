#!/bin/bash
# Round-5 fourth measured queue (session 3) — runs AFTER v15 training
# (40k warm from the v12+v14 soup, dothard=0.5) finishes. Stages D1-D3
# feed the promotion decision (manual); D4+ are the end-of-round
# measurements owed by VERDICT r4 #7/#9 and ADVICE r4 #1, serialized on
# the single chip with the box otherwise quiet (streaming jitter caveat,
# PERFORMANCE.md). Logs to /tmp/queue_r5d.log.
set -x
cd "$(dirname "$0")/.."

echo "=== D1. v15 eval: standard + calibrated dot tiers (n=2560) ==="
timeout 3000 python scripts/eval_jaxocr_cjk.py /tmp/jaxocr_v15.npz 40 2>&1 | grep "^{"
timeout 3000 python scripts/eval_jaxocr_cjk.py /tmp/jaxocr_v15.npz 40 --dot 2>&1 | grep "^{"

echo "=== D2. soup15 = avg(v15, soup) + eval ==="
python - <<'EOF'
import numpy as np
a = np.load('/tmp/jaxocr_soup.npz', allow_pickle=True)
b = np.load('/tmp/jaxocr_v15.npz', allow_pickle=True)
out = {}
for k in a.files:
    x, y = a[k], b[k]
    if x.dtype.kind == 'f' and x.shape == y.shape:
        out[k] = ((x.astype(np.float64) + y.astype(np.float64)) / 2).astype(x.dtype)
    else:
        out[k] = x
np.savez_compressed('/tmp/jaxocr_soup15.npz', **out)
print('soup15 saved')
EOF
timeout 3000 python scripts/eval_jaxocr_cjk.py /tmp/jaxocr_soup15.npz 40 2>&1 | grep "^{"
timeout 3000 python scripts/eval_jaxocr_cjk.py /tmp/jaxocr_soup15.npz 40 --dot 2>&1 | grep "^{"

echo "=== D3. [manual] promotion decision + e2e on the winner ==="
echo "=== queue r5d part 1 done ==="
