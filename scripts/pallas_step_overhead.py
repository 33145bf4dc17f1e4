"""Measure Mosaic's fixed per-grid-step overhead on this toolchain.

The round-2/3 kernel post-mortems rest on one empirical law — kernel
wall ≈ grid_steps × (10-22 µs) — inferred from three very different conv
kernels (docs/PERFORMANCE.md). This probe pins the constant directly: a
near-no-op kernel (copy one 8×128 tile) over a 1-D grid of N steps, for
N across three decades. The slope of wall(N) IS the per-step overhead,
uncontaminated by compute or HBM traffic.

Usage: python scripts/pallas_step_overhead.py [iters]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def copy_kernel(x_ref, o_ref):
    o_ref[...] = x_ref[...]


def run(n_steps, iters=20):
    x = jnp.zeros((n_steps, 8, 128), jnp.float32)

    f = jax.jit(lambda x: pl.pallas_call(
        copy_kernel,
        grid=(n_steps,),
        in_specs=[pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n_steps, 8, 128), jnp.float32),
    )(x))
    out = f(x)
    np.asarray(out[0, 0, :4])  # compile + sync
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(x)
        np.asarray(out[0, 0, :4])
    return (time.perf_counter() - t0) / iters


def main(iters=20):
    rows = []
    for n in (64, 256, 1024, 4096, 8192):
        try:
            dt = run(n, iters)
            rows.append((n, dt))
            print(json.dumps({"grid_steps": n, "ms": round(dt * 1e3, 3)}),
                  flush=True)
        except Exception as e:
            print(json.dumps({"grid_steps": n, "error": str(e)[:160]}),
                  flush=True)
    if len(rows) >= 2:
        # least-squares slope of wall vs steps = per-step cost
        ns = np.array([r[0] for r in rows], np.float64)
        ts = np.array([r[1] for r in rows], np.float64)
        slope = ((ns - ns.mean()) * (ts - ts.mean())).sum() / (
            (ns - ns.mean()) ** 2).sum()
        print(json.dumps({
            "per_step_us": round(slope * 1e6, 2),
            "fixed_ms": round((ts.mean() - slope * ns.mean()) * 1e3, 3),
        }), flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit()
         else 20)
