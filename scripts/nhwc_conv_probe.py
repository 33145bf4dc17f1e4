"""TPU probe: NHWC mega-kernels vs the XLA int8 conv emitter.

Measures the flagship conv shape (512²×64→64, batch 128, int8+requant)
as: XLA conv (the shipped graph's form), v1 NHWC streaming kernel, and
the pair-packed phase kernel (A→B). Times by fetching a tiny slice per
iteration, amortized (relay rules, docs/PERFORMANCE.md caveats).

Usage: python scripts/nhwc_conv_probe.py [batch] [iters] [--th N]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def timed(fn, args, iters, label):
    try:
        out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0][0, 0])  # compile+sync
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
            np.asarray(jax.tree.leaves(out)[0][0, 0, :8])
        dt = (time.perf_counter() - t0) / iters
        print(f"{label}: {dt*1e3:8.2f} ms/iter", flush=True)
        return dt
    except Exception as e:
        print(f"{label}: FAILED — {str(e)[:300]}", flush=True)
        return None


def main(batch=128, iters=10, th=8):
    from twinvoice_tpu.infer.quant import _conv3x3_i8, _requant
    from twinvoice_tpu.ops import nhwc_conv as NC

    h = w = 512
    c = co = 64
    rng = np.random.default_rng(0)
    # generate on-device (never ship GB arrays through the relay)
    key = jax.random.key(0)

    def gen(k):
        return jax.random.randint(k, (batch, h, w, c), 0, 127,
                                  dtype=jnp.int8)

    k8 = jnp.asarray(rng.integers(-127, 128, (3, 3, c, co), dtype=np.int8))
    a = jnp.asarray(rng.uniform(1e-3, 2e-3, (co,)), jnp.float32)
    bias = jnp.asarray(rng.normal(0, 0.1, (co,)), jnp.float32)
    os_ = jnp.float32(0.9)

    @jax.jit
    def xla_conv(x):
        y = _conv3x3_i8(x, {"kernel": k8}).astype(jnp.float32) * a + bias
        return _requant(jax.nn.relu(y), os_)

    # HBM hygiene (16 GB chip, r4 rev): at b128 each (B,512,512,64) int8
    # tensor is 2.1 GB and the Mosaic input relayout + the kernel's
    # internal H-slice each copy one more — so NEVER keep two layouts of
    # the input alive at once. Each family regenerates its input from the
    # PRNG key on-device (microseconds) instead of deriving it from a
    # kept-alive x; the r3 run OOM'd with x + xpad + out + xa all live.
    if "--trunk-only" in sys.argv:
        _trunk(batch, iters, rng)
        return

    x = jax.jit(gen)(key)
    x.block_until_ready()
    timed(xla_conv, (x,), iters, "XLA int8 conv+requant")
    x.delete()

    xpad = jax.jit(lambda k: NC.pad_nhwc(gen(k)))(key)
    xpad.block_until_ready()
    for th1 in (th, 16, 32):
        timed(lambda xp, _t=th1: NC.qconv3x3_nhwc_requant(
            xp, k8, a, bias, os_, th=_t, interpret=False),
            (xpad,), iters, f"v1 NHWC rolling-carry (th={th1})")
    xpad.delete()

    xa = jax.jit(lambda k: NC.to_phase_a(gen(k)))(key)
    xa.block_until_ready()
    wp = jnp.asarray(NC.pack_w_pair(k8))
    a2, b2 = jnp.tile(a, 2), jnp.tile(bias, 2)
    for th2 in (th, 16, 32):
        timed(lambda t, _t=th2: NC.qconv3x3_pair_requant(
            t, wp, a2, b2, os_, in_phase="A", th=_t, interpret=False),
            (xa,), iters, f"v2 pair-packed A->B (th={th2})")
    xa.delete()

    if "--trunk" in sys.argv:
        _trunk(batch, iters, rng)


def _trunk(batch, iters, rng):
    # full w64 serving box path on the mega-kernel trunk
    from twinvoice_tpu.config import InferConfig, UNetConfig
    from twinvoice_tpu.infer.pipeline import Segmenter
    from twinvoice_tpu.models.unet import init_unet

    mcfg, icfg = UNetConfig(base_width=64), InferConfig()
    params, state = init_unet(jax.random.key(0), mcfg)
    imgs = jnp.asarray(rng.integers(
        0, 255, (batch, 512, 512, 3), dtype=np.uint8))
    sizes = jnp.asarray([[1920, 1080]] * batch, jnp.int32)
    seg = Segmenter(params, state, mcfg, icfg, dtype=jnp.bfloat16,
                    int8_calib=[np.asarray(imgs[:8])], int8_wpack="nhwc")
    timed(lambda im: seg.segment_batch(im, sizes, return_masks=False)[1],
          (imgs,), iters, "w64 int8 box path, nhwc mega-kernel trunk")


if __name__ == "__main__":
    argv = [a for a in sys.argv[1:] if a.isdigit()]
    th = 8
    if "--th" in sys.argv:
        th = int(sys.argv[sys.argv.index("--th") + 1])
    main(int(argv[0]) if argv else 128,
         int(argv[1]) if len(argv) > 1 else 10, th)
