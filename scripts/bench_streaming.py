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
        # the bundled trained streaming-preset weights, if present; the
        # g384-trained preset when running at 384 (it exists exactly for
        # this config — the 512-trained weights at 384 are off-distribution)
        from twinvoice_tpu.models import pretrained

        variant = "w16_g384" if res == 384 else "w16"
        if pretrained.available(variant):
            from twinvoice_tpu.train.checkpoint import load_params_npz

            params, state = load_params_npz(
                pretrained.variant_path(variant), mcfg)
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

    result = {
        "metric": f"1080p streaming frame latency (device resize + bf16 w{width} U-Net@{res} + bbox)",
        "p50_ms": round(lat[len(lat) // 2], 2),
        "p95_ms": round(lat[int(0.95 * len(lat)) - 1], 2),
        "amortized_ms_2inflight": round(amortized, 2),
        "target_ms": 30,
    }
    print(json.dumps(result))
    return result


def spread(runs=5, frames=30, res=384, width=16):
    """VERDICT r3 #6: the ≤30 ms claim sat on ONE run of a relay-jitter-
    dominated path. Report the across-run spread so 'met' means met durably.
    The first run's numbers include residual warmup effects identically to
    the single-run protocol (compile happens once, in run 1's warmup)."""
    rs = [main(frames=frames, res=res, width=width) for _ in range(runs)]
    p50s = sorted(r["p50_ms"] for r in rs)
    amts = sorted(r["amortized_ms_2inflight"] for r in rs)
    print(json.dumps({
        "metric": f"streaming w{width}@{res} across {runs} runs",
        "p50_ms_min": p50s[0], "p50_ms_med": p50s[len(p50s) // 2],
        "p50_ms_max": p50s[-1],
        "amortized_min": amts[0], "amortized_med": amts[len(amts) // 2],
        "amortized_max": amts[-1],
        "target_ms": 30,
        "met_in_all_runs": amts[-1] <= 30.0,
    }))


if __name__ == "__main__":
    res = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    width = 16 if "--w16" in sys.argv else 64
    if "--spread" in sys.argv:
        spread(res=res, width=width)
    else:
        main(res=res, width=width)
