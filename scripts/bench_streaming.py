"""BASELINE config 5 (stretch) — streaming camera-frame latency.

Feeds 1080p frames one at a time through the device-resize serving graph
(resize→normalize→U-Net→threshold→bbox, batch=1) and reports p50/p95 frame
latency; target ≤30 ms/frame sustained.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(frames=30, res=512, width=64):
    import jax
    import jax.numpy as jnp

    from twinvoice_tpu.config import InferConfig, UNetConfig
    from twinvoice_tpu.infer.pipeline import Segmenter
    from twinvoice_tpu.models.unet import init_unet

    mcfg, icfg = UNetConfig(base_width=width), InferConfig(img_size=res)
    if width == 16:
        # the bundled trained streaming-preset weights, if present
        from twinvoice_tpu.models import pretrained

        if pretrained.available():
            from twinvoice_tpu.train.checkpoint import load_params_npz

            params, state = load_params_npz(pretrained.SEGMENTER_SYNTH_W16, mcfg)
        else:
            params, state = init_unet(jax.random.key(0), mcfg)
    else:
        params, state = init_unet(jax.random.key(0), mcfg)
    seg = Segmenter(params, state, mcfg, icfg, dtype=jnp.bfloat16)

    rng = np.random.default_rng(0)
    frame = jnp.asarray(rng.integers(0, 255, (1, 1080, 1920, 3), dtype=np.uint8))
    sizes = jnp.asarray([[1920, 1080]], jnp.int32)

    # warmup/compile; the streaming consumer wants field boxes, not masks —
    # box-only keeps the per-frame graph minimal
    for _ in range(2):
        out = seg.segment_batch(frame, sizes, pre_resized=False,
                                return_masks=False)
        jax.block_until_ready(out[1])

    lat = []
    for _ in range(frames):
        t0 = time.perf_counter()
        _, boxes, ok = seg.segment_batch(frame, sizes, pre_resized=False,
                                         return_masks=False)
        jax.device_get((boxes, ok))  # one host round-trip for both outputs
        lat.append(1e3 * (time.perf_counter() - t0))
    lat.sort()

    # amortized mode (VERDICT r2 #7): keep TWO frames in flight — dispatch
    # frame N+1 before fetching frame N's boxes, so per-frame cost rides the
    # relay pipeline instead of serializing dispatch→compute→fetch. This is
    # how a real streaming consumer would drive the graph (a camera always
    # has the next frame ready); each frame's boxes are still fetched.
    t0 = time.perf_counter()
    pending = None
    for _ in range(frames):
        _, boxes, ok = seg.segment_batch(frame, sizes, pre_resized=False,
                                         return_masks=False)
        if pending is not None:
            jax.device_get(pending)
        pending = (boxes, ok)
    jax.device_get(pending)
    amortized = 1e3 * (time.perf_counter() - t0) / frames

    print(
        json.dumps(
            {
                "metric": f"1080p streaming frame latency (device resize + bf16 w{width} U-Net@{res} + bbox)",
                "p50_ms": round(lat[len(lat) // 2], 2),
                "p95_ms": round(lat[int(0.95 * len(lat)) - 1], 2),
                "amortized_ms_2inflight": round(amortized, 2),
                "target_ms": 30,
            }
        )
    )


if __name__ == "__main__":
    res = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    width = 16 if "--w16" in sys.argv else 64
    main(res=res, width=width)
