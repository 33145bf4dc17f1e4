"""BASELINE config 3 measurement: U-Net train-step throughput + MFU.

The reference trains bs=4 at 512² on one device (train.py:99,129); this
measures the same shape plus the bf16 mixed-precision mode and a larger
batch, reporting img/s and MFU. MFU denominator is the chip's bf16 peak
(~197 TFLOP/s on v5e) for both precisions — v5e has no native fp32 MXU
path, so fp32 rows honestly show the cost of demanding fp32 math.

Train-step FLOPs are estimated as 3× forward (fwd + ~2× for bwd), forward
≈ 219 GFLOP per 512² image at width 64 (BASELINE.md).

Usage: python scripts/bench_train.py [iters]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

if "--dp-sweep" in sys.argv:
    # the DP curve runs on virtual CPU devices (no multi-chip hardware on
    # this box). The axon TPU plugin IGNORES the JAX_PLATFORMS env var —
    # only the config API keeps the TPU backend out (tests/conftest.py
    # recipe, same as __graft_entry__.dryrun_multichip)
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)

import jax.numpy as jnp

FWD_GFLOP_PER_IMG = 219.0
BF16_PEAK_TFLOPS = 197.0


def bench(dtype_name, batch, iters=6, remat=False, fast_norm=False):
    from twinvoice_tpu.config import TrainConfig, UNetConfig
    from twinvoice_tpu.models.unet import init_unet
    from twinvoice_tpu.train.trainer import TrainState, make_optimizer, make_train_step

    dtype = jnp.bfloat16 if dtype_name == "bf16" else jnp.float32
    mcfg = UNetConfig()
    tcfg = TrainConfig(batch_size=batch, dtype=dtype_name, remat=remat,
                       fast_norm=fast_norm)
    params, bn = init_unet(jax.random.key(0), mcfg)
    opt = make_optimizer(tcfg)
    state = TrainState(params, bn, opt.init(params))
    step = make_train_step(mcfg, tcfg, opt)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (batch, 512, 512, 3)), dtype)
    y = jnp.asarray((rng.uniform(size=(batch, 512, 512, 3)) > 0.9), dtype)
    lr = jnp.float32(1e-3)

    p, b, o, loss = step(state.params, state.bn_state, state.opt_state, x, y, lr)
    float(loss)  # compile + sync
    t0 = time.perf_counter()
    for _ in range(iters):
        p, b, o, loss = step(p, b, o, x, y, lr)
        float(loss)
    dt = (time.perf_counter() - t0) / iters

    tflops = 3 * FWD_GFLOP_PER_IMG * batch / dt / 1e3
    rlabel = (" remat" if remat else "") + (" fastnorm" if fast_norm else "")
    row = {
        "config": f"{dtype_name} bs={batch}{rlabel} @512^2 (fwd+bwd+AdamW, 1 chip)",
        "ms_per_step": round(dt * 1e3, 1),
        "img_per_s": round(batch / dt, 2),
        "tflops": round(tflops, 1),
        "mfu_vs_bf16_peak": round(tflops / BF16_PEAK_TFLOPS, 3),
    }
    print(json.dumps(row), flush=True)
    return row


def dp_sweep(iters=3, batch=8, grid=256, width=16):
    """DP scaling curve over 1/2/4/8 virtual CPU devices (VERDICT r2 #6).

    Fixed GLOBAL batch, sharded over the mesh 'data' axis, so the curve
    isolates the pjit partitioning + grad-psum overhead. All devices share
    this box's single physical core, so absolute img/s is meaningless and
    ideal scaling is FLAT ms/step; reported as ms/step + overhead vs the
    1-device row.
    """
    from twinvoice_tpu.config import MeshConfig, TrainConfig, UNetConfig
    from twinvoice_tpu.core.mesh import make_mesh
    from twinvoice_tpu.models.unet import init_unet
    from twinvoice_tpu.train.trainer import (
        TrainState, make_optimizer, make_train_step, shard_train_state)

    mcfg = UNetConfig(base_width=width)
    tcfg = TrainConfig(batch_size=batch, dtype="float32")
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (batch, grid, grid, 3)), jnp.float32)
    y = jnp.asarray((rng.uniform(size=(batch, grid, grid, 3)) > 0.9),
                    jnp.float32)
    base = None
    for nd in (1, 2, 4, 8):
        mesh = make_mesh(MeshConfig(data=nd), devices=jax.devices()[:nd])
        params, bn = init_unet(jax.random.key(0), mcfg)
        opt = make_optimizer(tcfg)
        state = shard_train_state(TrainState(params, bn, opt.init(params)), mesh)
        step = make_train_step(mcfg, tcfg, opt, mesh=mesh)
        lr = jnp.float32(1e-3)
        p, b, o, loss = step(state.params, state.bn_state, state.opt_state,
                             x, y, lr)
        float(loss)
        t0 = time.perf_counter()
        for _ in range(iters):
            p, b, o, loss = step(p, b, o, x, y, lr)
            float(loss)
        dt = (time.perf_counter() - t0) / iters
        base = base or dt
        print(json.dumps({
            "devices": nd, "global_batch": batch, "grid": grid,
            "width": width, "ms_per_step": round(dt * 1e3, 1),
            "overhead_vs_1dev": round(dt / base - 1, 3),
            "loss": round(float(loss), 5),
        }), flush=True)


def main(iters=6, sweep=False):
    if sweep:
        # VERDICT r2 #6: batch scaling to the OOM edge, MFU per point,
        # then the remat variant past the plain-mode edge
        def try_cfg(label, *a, **kw):
            # the remote compile helper 500s transiently (tpu ops notes);
            # retry once before concluding a config is infeasible
            for attempt in (1, 2):
                try:
                    bench(*a, **kw)
                    return True
                except Exception as e:
                    err = str(e)[:160]
                    if attempt == 2:
                        print(json.dumps({"config": label, "error": err}),
                              flush=True)
            return False

        for batch in (16, 24, 32, 48, 64):
            if not try_cfg(f"bf16 bs={batch}", "bf16", batch, iters):
                break
        # remat from bs=16: establishes whether ANY remat graph compiles
        # on this toolchain before concluding the lever is blocked
        for batch in (16, 32, 48, 64, 96):
            if not try_cfg(f"bf16 bs={batch} remat", "bf16", batch, iters,
                           remat=True):
                break
        return
    if "--fastnorm" in sys.argv:
        # VERDICT r4 weak #6 lever A/B: bf16 step with the BN normalize in
        # bf16 (fp32 stats) vs the incumbent fp32-normalize step
        for fast in (False, True):
            bench("bf16", 16, iters, fast_norm=fast)
            bench("bf16", 24, iters, fast_norm=fast)
        return
    for dtype_name, batch in (("fp32", 4), ("bf16", 4), ("bf16", 16)):
        bench(dtype_name, batch, iters)


if __name__ == "__main__":
    it = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 6
    if "--dp-sweep" in sys.argv:
        dp_sweep(it if it != 6 else 3)
    else:
        main(it, sweep="--sweep" in sys.argv)
