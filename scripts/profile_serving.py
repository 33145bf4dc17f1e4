"""Serving-path profiler: stage-by-stage timings on the current device.

Usage: python scripts/profile_serving.py  (run from the repo root)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from twinvoice_tpu.config import InferConfig, UNetConfig
from twinvoice_tpu.infer.postprocess import bbox_from_probs, scale_and_pad_boxes
from twinvoice_tpu.models.unet import fold_unet, init_unet, unet_apply_folded

mcfg = UNetConfig()
icfg = InferConfig()
B = 32


def bench(fn, make_args, iters=8):
    out = fn(*make_args(0))
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(iters):
        out = fn(*make_args(i))
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    return dt


def main():
    print("device:", jax.devices()[0])
    params, state = init_unet(jax.random.key(0), mcfg)
    rng = np.random.default_rng(0)
    imgs_np = [
        rng.integers(0, 255, (B, 512, 512, 3), dtype=np.uint8) for _ in range(2)
    ]
    imgs = [jnp.asarray(a) for a in imgs_np]
    sizes = jnp.asarray([[1920, 1080]] * B, jnp.int32)
    thr = jnp.asarray(icfg.thresholds, jnp.float32)

    for dtype, name in [(jnp.bfloat16, "bf16"), (jnp.float32, "fp32")]:
        folded = fold_unet(params, state, cfg=mcfg, dtype=dtype)

        @jax.jit
        def fwd_only(folded, im):
            x = im.astype(dtype) / jnp.asarray(255.0, dtype)
            return unet_apply_folded(folded, x)

        t = bench(fwd_only, lambda i: (folded, imgs[i % 2]))
        print(f"{name} fwd-only:  {t * 1e3:7.1f} ms/batch  {B / t:6.0f} img/s")

    folded = fold_unet(params, state, cfg=mcfg, dtype=jnp.bfloat16)

    @jax.jit
    def fwd_post(folded, im, sizes):
        x = im.astype(jnp.bfloat16) / jnp.bfloat16(255.0)
        logits = unet_apply_folded(folded, x)
        prob = jax.nn.sigmoid(logits.astype(jnp.float32))

        def post(p, osz):
            g, v = bbox_from_probs(p, thr)
            return scale_and_pad_boxes(g, v, osz, 512, icfg.pad_frac)

        return jax.vmap(post)(prob, sizes)

    t = bench(fwd_post, lambda i: (folded, imgs[i % 2], sizes))
    print(f"bf16 fwd+post:      {t * 1e3:7.1f} ms/batch  {B / t:6.0f} img/s")

    @jax.jit
    def post_only(logits, sizes):
        prob = jax.nn.sigmoid(logits.astype(jnp.float32))

        def post(p, osz):
            g, v = bbox_from_probs(p, thr)
            return scale_and_pad_boxes(g, v, osz, 512, icfg.pad_frac)

        return jax.vmap(post)(prob, sizes)

    logits = jnp.asarray(rng.standard_normal((B, 512, 512, 3)), jnp.bfloat16)
    t = bench(post_only, lambda i: (logits, sizes))
    print(f"post-only:          {t * 1e3:7.1f} ms/batch  {B / t:6.0f} img/s")

    # per-resolution forward scan
    for res in (256, 384, 512):
        im = jnp.asarray(rng.integers(0, 255, (B, res, res, 3), dtype=np.uint8))

        @jax.jit
        def fwd(folded, im):
            x = im.astype(jnp.bfloat16) / jnp.bfloat16(255.0)
            return unet_apply_folded(folded, x)

        t = bench(fwd, lambda i: (folded, im))
        print(f"bf16 fwd @{res}:     {t * 1e3:7.1f} ms/batch  {B / t:6.0f} img/s")


if __name__ == "__main__":
    main()
