"""Capture and summarize an xprof trace of the serving forward pass.

``jax.profiler.trace`` works on this TPU (writes vm.trace.json.gz); this
script runs the folded forward under a trace and prints the top device-side
fusions by accumulated time — the round-2 kernel-hunting entry point.

Usage: python scripts/trace_report.py [batch] [--int8] [--no-wpack]
"""

import glob
import gzip
import json
import os
import sys
import tempfile
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main(batch=32, int8=False, wpack=True):
    from twinvoice_tpu.config import UNetConfig
    from twinvoice_tpu.models.unet import fold_unet, init_unet, unet_apply_folded

    mcfg = UNetConfig()
    params, state = init_unet(jax.random.key(0), mcfg)
    imgs = jnp.asarray(
        np.random.default_rng(0).integers(0, 255, (batch, 512, 512, 3), dtype=np.uint8)
    )

    if int8:
        # trace the REAL int8 serving box path (concat trunk + bbox head)
        from twinvoice_tpu.config import InferConfig
        from twinvoice_tpu.infer.pipeline import Segmenter

        seg = Segmenter(params, state, mcfg, InferConfig(),
                        dtype=jnp.bfloat16, int8_calib=[np.asarray(imgs[:8])],
                        int8_wpack=wpack)
        sizes = jnp.asarray([[1920, 1080]] * batch, jnp.int32)

        def f(folded, imgs):
            _, boxes, _ = seg.segment_batch(imgs, sizes, return_masks=False)
            return boxes

        folded = None
    else:
        folded = fold_unet(params, state, cfg=mcfg, dtype=jnp.bfloat16)

        @jax.jit
        def f(folded, imgs):
            x = imgs.astype(jnp.bfloat16) / jnp.bfloat16(255.0)
            return unet_apply_folded(folded, x)[:, :1, :1]  # tiny fetch

    np.asarray(f(folded, imgs))  # compile
    out_dir = tempfile.mkdtemp(prefix="xprof_")
    with jax.profiler.trace(out_dir):
        for _ in range(2):
            np.asarray(f(folded, imgs))

    path = sorted(glob.glob(os.path.join(out_dir, "plugins/profile/*/*.trace.json.gz")))[-1]
    with gzip.open(path) as fh:
        events = json.load(fh).get("traceEvents", [])
    agg = defaultdict(float)
    for e in events:
        name = e.get("name", "")
        # keep device-side XLA ops, drop host python frames
        if e.get("ph") == "X" and e.get("dur") and not name.startswith("$") \
                and "asarray" not in name and "jit_" not in name \
                and "PjitFunction" not in name and "profiler" not in name:
            agg[name] += e["dur"]
    print(f"trace: {path}")
    for name, dur in sorted(agg.items(), key=lambda kv: -kv[1])[:20]:
        print(f"{dur/1000:9.2f} ms  {name[:90]}")


if __name__ == "__main__":
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    main(int(argv[0]) if argv else 32, int8="--int8" in sys.argv,
         wpack="--no-wpack" not in sys.argv)
