"""Micro-probe: does the frame-format Pallas int8 conv lower and how fast?

Runs ops/qconv_pallas.qconv3x3_requant on the full-res flagship shape —
the 512²×64→64 conv that XLA's int8 emitter runs at ~22 ms/batch-128
(~28% of int8 MXU peak, docs/PERFORMANCE.md) — plus the split decoder
conv and the pool/upsample kernels, on real TPU. Prints ms/iter for each
kernel or the head of the compile error. Run ONLY when the TPU is free
(exclusive access).

Usage: python scripts/pallas_conv_probe.py [H] [N] [iters]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def fetch_tiny(out):
    """Force execution with a tiny host readback (the relay makes full
    fetches dominate)."""
    import jax.numpy as jnp

    return np.asarray(jnp.ravel(out)[:2])


def bench(name, fn, *args, iters=5):
    try:
        fetch_tiny(fn(*args))
        t0 = time.perf_counter()
        for _ in range(iters):
            fetch_tiny(fn(*args))
        dt = (time.perf_counter() - t0) / iters
        print(f"{name}: {dt*1e3:8.2f} ms/iter", flush=True)
        return dt
    except Exception as e:  # noqa: BLE001 — print and move to next probe
        print(f"{name}: FAILED — {str(e)[:300]}", flush=True)
        return None


def main(H=512, N=128, iters=5):
    from twinvoice_tpu.ops import qconv_pallas as QP

    C = 64
    rng = np.random.default_rng(0)
    # activations are generated ON DEVICE — shipping a 4.3 GB host array
    # through this box's relay takes tens of minutes
    keys = jax.random.split(jax.random.key(0), 2)
    mk = jax.jit(lambda key: QP.to_frame(
        jax.random.randint(key, (H, C, H, N), 0, 80).astype(jnp.int8)))
    x = mk(keys[0])
    x2 = mk(keys[1])
    jax.block_until_ready(x2)
    print("device inputs ready", flush=True)
    k = rng.integers(-20, 21, (3, 3, C, C), dtype=np.int8)
    k2 = rng.integers(-20, 21, (3, 3, C, C), dtype=np.int8)
    a = jnp.asarray(rng.uniform(1e-3, 2e-3, C), jnp.float32)
    b = jnp.asarray(rng.normal(0, 0.5, C), jnp.float32)

    cc = QP._plan_tiles(H, C, H, N, C)[2]
    wp = QP.pack_w3x3(k, cc)
    print(f"tiles {QP._plan_tiles(H, C, H, N, C)}", flush=True)
    bench("qconv 512²x64→64", lambda: QP.qconv3x3_requant(
        x, wp, a, b, 3.0, interpret=False), iters=iters)

    wpd = QP.pack_w3x3(k)
    bench("qconv DMA-pipelined", lambda: QP.qconv3x3_requant_dma(
        x, wpd, a, b, 3.0, interpret=False), iters=iters)

    cc2 = QP._plan_tiles(H, C, H, N, C, two_inputs=True)[2]
    wp1 = QP.pack_w3x3(k, cc2)
    wp2 = QP.pack_w3x3(k2, cc2)
    bench("qconv split (dec3.conv1)", lambda: QP.qconv3x3_split_requant(
        x, x2, wp1, wp2, a, b, 3.0, interpret=False), iters=iters)

    bench("maxpool 512²x64", lambda: QP.max_pool2_hcwn(x, interpret=False),
          iters=iters)

    xs = jax.jit(lambda key: QP.to_frame(
        jax.random.randint(key, (H // 2, C, H // 2, N), 0, 80).astype(jnp.int8)
    ))(keys[0])
    wu = QP.pack_wup(rng.integers(-20, 21, (2, 2, C, C), dtype=np.int8))
    bench("upsample 256²x64→512²", lambda: QP.qupsample2x2_requant(
        xs, wu, a, b, 3.0, interpret=False), iters=iters)

    w_out = jnp.asarray(rng.standard_normal((C, 3)), jnp.float32)
    bench("head einsum (XLA)", lambda: QP.head_rowcol_max_frame(
        x, w_out, jnp.float32(0.01))[0], iters=iters)


if __name__ == "__main__":
    argv = sys.argv[1:]
    main(int(argv[0]) if argv else 512,
         int(argv[1]) if len(argv) > 1 else 128,
         int(argv[2]) if len(argv) > 2 else 5)
