"""End-to-end serving benchmark: invoice images/sec/chip.

Measures the BASELINE primary metric (BASELINE.md): uint8 512×512 batch →
normalize → BN-folded bf16 U-Net → logit-space bbox → box fetch — the full
preproc+segment+crop-box pipeline as one jitted graph — on whatever single
chip is available (TPU when run by the driver).

The benched flagship is the **bundled TRAINED width-16 segmenter** (the
model the shipped recognition stack actually runs; quality evidence:
docs/PERFORMANCE.md gauntlet table — held-out fonts/content + photographic
perturbations it can fail). bf16 is its fastest mode (int8 loses at width
16 — the graph is memory-bound and requant epilogues outweigh the halved
MXU work; measured in docs/PERFORMANCE.md). The width-64 reference
architecture (375 bf16 / 483 int8 img/s) remains available via
UNetConfig(base_width=64) and scripts/bench_int8_serving.py.

Falls back to the width-64 reference architecture with random weights if
the bundled weights are missing, so the driver always gets a number.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "img/s", "vs_baseline": N}
vs_baseline is measured throughput / the 1000 img/s/chip north-star target
(the reference itself publishes no numbers; BASELINE.json:13).
"""

import json
import time

import numpy as np


def build_segmenter():
    import jax
    import jax.numpy as jnp

    from twinvoice_tpu.config import InferConfig, UNetConfig
    from twinvoice_tpu.infer.pipeline import Segmenter
    from twinvoice_tpu.models import pretrained
    from twinvoice_tpu.models.unet import init_unet

    icfg = InferConfig()
    if pretrained.available():
        seg = pretrained.load_pretrained_segmenter(
            dtype=jnp.bfloat16, infer_cfg=icfg
        )
        label = "trained w16"
        return seg, icfg, label
    mcfg = UNetConfig()
    params, state = init_unet(jax.random.key(0), mcfg)
    seg = Segmenter(params, state, mcfg, icfg, dtype=jnp.bfloat16)
    return seg, icfg, "w64 (random init fallback)"


def main():
    import os

    import jax.numpy as jnp

    seg, icfg, label = build_segmenter()
    # throughput sweet spot on v5e (b32=208 ... b128 best); env overrides
    # exist only for CPU smoke-drives of the bench path
    batch = int(os.environ.get("BENCH_BATCH", 128))

    rng = np.random.default_rng(0)
    imgs = jnp.asarray(
        rng.integers(0, 255, (batch, icfg.img_size, icfg.img_size, 3), dtype=np.uint8)
    )
    sizes = jnp.asarray([[1920, 1080]] * batch, jnp.int32)

    # warmup (compile) + steady-state timing; box-only throughput path
    for _ in range(2):
        _, boxes, ok = seg.segment_batch(imgs, sizes, return_masks=False)
        np.asarray(boxes)

    iters = int(os.environ.get("BENCH_ITERS", 10))
    t0 = time.perf_counter()
    for _ in range(iters):
        _, boxes, ok = seg.segment_batch(imgs, sizes, return_masks=False)
        np.asarray(boxes)  # device→host box readback (the crop input)
    dt = time.perf_counter() - t0
    serial = batch * iters / dt

    # serving protocol: keep TWO batches in flight — dispatch batch N+1
    # before fetching batch N's boxes, hiding the relay's dispatch+fetch
    # round-trip behind device compute (every batch's boxes still reach the
    # host; queue depth 2 is standard serving practice)
    t0 = time.perf_counter()
    pending = None
    for _ in range(iters):
        _, boxes, ok = seg.segment_batch(imgs, sizes, return_masks=False)
        if pending is not None:
            np.asarray(pending)
        pending = boxes
    np.asarray(pending)
    dt = time.perf_counter() - t0

    pipelined = batch * iters / dt

    # Headline protocol is FIXED: queue-depth-2 dispatch (standard serving
    # practice; hides the relay's dispatch+fetch RTT). Both protocols are
    # reported as separate fields so round-over-round comparisons never mix
    # them (ADVICE r3: the old max(serial, pipelined) headline silently
    # switched protocols run-to-run).
    print(
        json.dumps(
            {
                "metric": (
                    f"invoice images/sec/chip end-to-end "
                    f"(preproc+U-Net+bbox, {label} bf16 batch-{batch} "
                    f"{icfg.img_size}^2, queue-depth-2 dispatch; quality: "
                    f"docs/PERFORMANCE.md gauntlet)"
                ),
                "value": round(pipelined, 2),
                "unit": "img/s",
                "vs_baseline": round(pipelined / 1000.0, 4),
                "pipelined_img_per_s": round(pipelined, 2),
                "serial_img_per_s": round(serial, 2),
            }
        )
    )


def _guarded_device_init(seconds=300):
    """Fail fast with a machine-readable error instead of hanging forever
    when the TPU relay is down (it died mid-round-3; jax.devices() then
    blocks indefinitely). Guards ONLY backend init — compiles can stall
    10-15 min on this relay and recover, so they must not be clocked.
    """
    import os
    import threading

    def boom():
        print(json.dumps({
            "metric": "invoice images/sec/chip end-to-end",
            "value": 0, "unit": "img/s", "vs_baseline": 0,
            "error": f"device init exceeded {seconds}s — TPU relay down",
        }), flush=True)
        os._exit(3)

    t = threading.Timer(seconds, boom)
    t.daemon = True
    t.start()
    import jax

    jax.devices()  # blocks forever when the relay stdio bridge is dead
    t.cancel()


if __name__ == "__main__":
    _guarded_device_init()
    main()
