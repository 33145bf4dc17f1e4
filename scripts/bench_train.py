"""BASELINE config 3 measurement: full-width U-Net train-step throughput
(the reference trains bs=4 at 512²; same shape here, one chip)."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main(batch=4, iters=6):
    from twinvoice_tpu.config import TrainConfig, UNetConfig
    from twinvoice_tpu.models.unet import init_unet
    from twinvoice_tpu.train.trainer import TrainState, make_optimizer, make_train_step

    mcfg, tcfg = UNetConfig(), TrainConfig(batch_size=batch)
    params, bn = init_unet(jax.random.key(0), mcfg)
    opt = make_optimizer(tcfg)
    state = TrainState(params, bn, opt.init(params))
    step = make_train_step(mcfg, tcfg, opt)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (batch, 512, 512, 3)), jnp.float32)
    y = jnp.asarray((rng.uniform(size=(batch, 512, 512, 3)) > 0.9), jnp.float32)
    lr = jnp.float32(1e-3)

    p, b, o, loss = step(state.params, state.bn_state, state.opt_state, x, y, lr)
    float(loss)  # compile + sync
    t0 = time.perf_counter()
    for _ in range(iters):
        p, b, o, loss = step(p, b, o, x, y, lr)
        float(loss)
    dt = (time.perf_counter() - t0) / iters
    print(json.dumps({
        "metric": "train step (fp32, bs=4 @512^2, fwd+bwd+AdamW, 1 chip)",
        "ms_per_step": round(dt * 1e3, 1),
        "img_per_s": round(batch / dt, 2),
    }))


if __name__ == "__main__":
    main()
