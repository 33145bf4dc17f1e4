"""End-to-end serving benchmark: invoice images/sec/chip.

Measures the BASELINE primary metric (BASELINE.md): uint8 512×512 batch →
normalize → BN-folded bf16 U-Net → sigmoid → per-field threshold → bbox
scale/pad — the full preproc+segment+crop-box pipeline as one jitted graph —
on whatever single chip is available (TPU when run by the driver).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "img/s", "vs_baseline": N}
vs_baseline is measured throughput / the 1000 img/s/chip north-star target
(the reference itself publishes no numbers; BASELINE.json:13).
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from twinvoice_tpu.config import InferConfig, UNetConfig
    from twinvoice_tpu.infer.pipeline import Segmenter
    from twinvoice_tpu.models.unet import init_unet

    mcfg = UNetConfig()
    icfg = InferConfig()
    batch = 128  # throughput sweet spot on v5e: b32=208, b64=231, b128=289 img/s

    params, state = init_unet(jax.random.key(0), mcfg)
    seg = Segmenter(params, state, mcfg, icfg, dtype=jnp.bfloat16)

    rng = np.random.default_rng(0)
    imgs = jnp.asarray(
        rng.integers(0, 255, (batch, icfg.img_size, icfg.img_size, 3), dtype=np.uint8)
    )
    sizes = jnp.asarray([[1920, 1080]] * batch, jnp.int32)

    # warmup (compile) + steady-state timing; box-only throughput path
    for _ in range(2):
        _, boxes, ok = seg.segment_batch(imgs, sizes, return_masks=False)
        np.asarray(boxes)

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        _, boxes, ok = seg.segment_batch(imgs, sizes, return_masks=False)
        np.asarray(boxes)  # device→host box readback (the crop input)
    dt = time.perf_counter() - t0

    img_per_s = batch * iters / dt
    print(
        json.dumps(
            {
                "metric": "invoice images/sec/chip end-to-end (preproc+U-Net+bbox, bf16 batch-128 512^2)",
                "value": round(img_per_s, 2),
                "unit": "img/s",
                "vs_baseline": round(img_per_s / 1000.0, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
