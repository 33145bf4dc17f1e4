"""Whole-graph serving A/B: bf16 vs int8 MXU path on the width-64 flagship.

Measures the full fused pipeline (uint8 batch → U-Net → logit-space bbox →
box fetch) through the Segmenter, amortized over batches, like bench.py.
Decides whether the int8 path (infer/quant.py) is promoted for the w64
config (VERDICT r1 #2: interior convs were already at ~98% of bf16 peak,
int8 is the remaining lever).

Usage: python scripts/bench_int8_serving.py [batch] [iters] [--w16]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from twinvoice_tpu.config import InferConfig, UNetConfig
from twinvoice_tpu.infer.pipeline import Segmenter
from twinvoice_tpu.models.unet import init_unet


def run(seg, imgs, sizes, iters):
    for _ in range(2):  # compile + warm
        _, boxes, ok = seg.segment_batch(imgs, sizes, return_masks=False)
        np.asarray(boxes)
    t0 = time.perf_counter()
    for _ in range(iters):
        _, boxes, ok = seg.segment_batch(imgs, sizes, return_masks=False)
        np.asarray(boxes)
    serial = (time.perf_counter() - t0) / iters
    # queue-depth-2 dispatch: hides the relay round-trip behind compute
    t0 = time.perf_counter()
    pending = None
    for _ in range(iters):
        _, boxes, ok = seg.segment_batch(imgs, sizes, return_masks=False)
        if pending is not None:
            np.asarray(pending)
        pending = boxes
    np.asarray(pending)
    return serial, (time.perf_counter() - t0) / iters


def main(batch=128, iters=10, width=64):
    mcfg = UNetConfig(base_width=width)
    icfg = InferConfig()
    params, state = init_unet(jax.random.key(0), mcfg)
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(
        rng.integers(0, 255, (batch, icfg.img_size, icfg.img_size, 3), dtype=np.uint8)
    )
    sizes = jnp.asarray([[1920, 1080]] * batch, jnp.int32)
    calib = [np.asarray(imgs[:8])]

    variants = [
        ("bf16", dict(dtype=jnp.bfloat16)),
        ("int8+pallas-head", dict(dtype=jnp.bfloat16, int8_calib=calib,
                                  int8_pallas=False, int8_head="pallas",
                                  int8_wpack=False)),
        ("int8+xla-head", dict(dtype=jnp.bfloat16, int8_calib=calib,
                               int8_pallas=False, int8_head="xla",
                               int8_wpack=False)),
        ("int8+xla-bf16-head", dict(dtype=jnp.bfloat16, int8_calib=calib,
                                    int8_pallas=False, int8_head="xla-bf16",
                                    int8_wpack=False)),
        ("int8+wpack", dict(dtype=jnp.bfloat16, int8_calib=calib,
                            int8_pallas=False, int8_wpack=True)),
    ]
    if "--pallas" in sys.argv:
        # the frame-format Pallas trunk (ops/qconv_pallas)
        variants.append(
            ("int8-pallas-trunk", dict(dtype=jnp.bfloat16, int8_calib=calib,
                                       int8_pallas=True)))
    for name, kw in variants:
        try:
            seg = Segmenter(params, state, mcfg, icfg, **kw)
            dt, dt2 = run(seg, imgs, sizes, iters)
            print(f"w{width} {name}: {dt*1e3:7.1f} ms/batch-{batch}  "
                  f"{batch/dt:7.1f} img/s  |  2-in-flight "
                  f"{dt2*1e3:7.1f} ms  {batch/dt2:7.1f} img/s", flush=True)
        except Exception as e:
            print(f"w{width} {name}: FAILED — {str(e)[:400]}", flush=True)


if __name__ == "__main__":
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    it = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    w = 16 if "--w16" in sys.argv else 64
    main(b, it, w)
