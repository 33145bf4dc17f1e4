"""Whole-pipeline serving variants: one amortized number per configuration.

Times the full fused graph (normalize→U-Net→postprocess) end-to-end with a
small host fetch per batch (like production), averaged over many batches —
robust against this platform's unreliable block_until_ready.
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
from twinvoice_tpu.ops.pallas.postprocess import bbox_postprocess_pallas

mcfg = UNetConfig()
icfg = InferConfig()


def run_variant(name, make_fn, batch, iters=8):
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(
        rng.integers(0, 255, (batch, 512, 512, 3), dtype=np.uint8)
    )
    sizes = jnp.asarray([[1920, 1080]] * batch, jnp.int32)
    fn = make_fn()
    out = fn(imgs, sizes)
    np.asarray(out[0])  # compile + fetch
    np.asarray(fn(imgs, sizes)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(imgs, sizes)
        np.asarray(out[0])  # fetch boxes (the thing the host needs)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:34s}: {dt*1e3:8.1f} ms/batch {batch/dt:7.1f} img/s", flush=True)
    return batch / dt


def xla_post(folded, thr):
    @jax.jit
    def f(imgs, sizes):
        x = imgs.astype(jnp.bfloat16) / jnp.bfloat16(255.0)
        logits = unet_apply_folded(folded, x)
        prob = jax.nn.sigmoid(logits.astype(jnp.float32))

        def post(p, osz):
            g, v = bbox_from_probs(p, thr)
            return scale_and_pad_boxes(g, v, osz, 512, icfg.pad_frac)

        boxes, ok = jax.vmap(post)(prob, sizes)
        return boxes, ok

    return f


def pallas_post(folded, thr):
    @jax.jit
    def f(imgs, sizes):
        x = imgs.astype(jnp.bfloat16) / jnp.bfloat16(255.0)
        logits = unet_apply_folded(folded, x)
        gboxes, valid = bbox_postprocess_pallas(logits, thr)
        boxes, ok = jax.vmap(
            lambda g, v, osz: scale_and_pad_boxes(g, v, osz, 512, icfg.pad_frac)
        )(gboxes, valid, sizes)
        return boxes, ok

    return f


def main():
    params, state = init_unet(jax.random.key(0), mcfg)
    folded = fold_unet(params, state, cfg=mcfg, dtype=jnp.bfloat16)
    thr = jnp.asarray(icfg.thresholds, jnp.float32)

    run_variant("bf16 b32 xla-post", lambda: xla_post(folded, thr), 32)
    run_variant("bf16 b32 pallas-post", lambda: pallas_post(folded, thr), 32)
    run_variant("bf16 b64 xla-post", lambda: xla_post(folded, thr), 64)
    run_variant("bf16 b8  xla-post", lambda: xla_post(folded, thr), 8)


if __name__ == "__main__":
    main()
