"""Pallas int8 U-Net kernels — fused conv+requant in an (H, C, W, N) layout.

Why (VERDICT r1 #2): the int8 XLA serving graph (infer/quant.py) loses ~40%
of its runtime to two structural problems the XLA fusion pass cannot fix:

1. **s32 materialization.** The split-decoder convs (`part_up`/`part_skip`,
   quant.py) force XLA to write raw s32 conv outputs to HBM (4 bytes/elem at
   full resolution — fusion.30 alone is 17.5 ms/batch-128) because the
   combining add lives in a different fusion. Here conv → dequant → add →
   ReLU → requant is ONE kernel; nothing wider than int8 ever leaves VMEM.
2. **Phase overlap at full resolution.** The 512²×64ch convs run at ~28% of
   the int8 MXU peak under XLA's conv emitter. The strip kernel pipelines
   HBM→VMEM row-strips (pl.Element halo windows, double-buffered by the
   Pallas runtime) against dy-packed GEMMs (K = 3·Cin).

Layout: activations are (H, C, W, N) — lanes = batch N, sublanes = W.
A row strip x[h-1:h+2] is then contiguous in (dy, Cin), so the kernel GEMM
  lhs (Cout, 3·Cin) @ rhs (3·Cin, Wt, N)
needs no in-kernel data shuffling at all: the K dimension is a free reshape
and the three dx taps are free W-dim slices of the halo'd block.

Weight prepack: ``pack_w3x3`` rearranges an HWIO (3,3,Cin,Cout) int8 kernel
to (3dx, Cout, 3dy·Cin) so ``w[dx]`` is the GEMM lhs.

Boundary semantics: pl.Element windows expose garbage in the halo positions
at array edges; every kernel masks them to zero (SAME zero padding —
matching ops/conv.conv3x3 and the torch reference, unet_model.py:10).

Used by infer/quant.py's `unet_apply_quantized_pallas` for the serving box
path; correctness is pinned against the XLA int8 graph in
tests/unit/test_qconv_pallas.py (interpret mode, CPU).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret_default():
    return jax.default_backend() != "tpu"


# ------------------------------------------------------------------ prepack


def pack_w3x3(kernel_hwio):
    """(3,3,Cin,Cout) int8 HWIO → (3dx, Cout, 3dy·Cin) GEMM lhs."""
    k = np.asarray(kernel_hwio)
    _, _, cin, cout = k.shape
    out = np.zeros((3, cout, 3 * cin), k.dtype)
    for dx in range(3):
        for dy in range(3):
            out[dx, :, dy * cin : (dy + 1) * cin] = k[dy, dx].T
    return jnp.asarray(out)


def to_hcwn(x_nhwc):
    """(N, H, W, C) → (H, C, W, N). A real transpose under XLA; used at the
    Pallas-region boundaries (cheap for uint8 input / small deep tensors)."""
    return jnp.transpose(x_nhwc, (1, 3, 2, 0))


def from_hcwn(x_hcwn):
    """(H, C, W, N) → (N, H, W, C)."""
    return jnp.transpose(x_hcwn, (3, 0, 2, 1))


# ------------------------------------------------------------ tile planning


def _plan_tiles(h, cin, w, n, cout, cin2=0, budget=11 << 20):
    """Pick (Hs, Wt) so the kernel's VMEM footprint stays under ``budget``:
    2×(double-buffered input strips) + s32 accumulator + output block."""
    for wt in (256, 128, 64, 32, 16, 8):
        if w % wt and wt <= w:
            continue
        wt_eff = min(wt, w)
        if w % wt_eff:
            continue
        for hs in (4, 2, 1):
            if h % hs:
                continue
            in_bytes = 2 * (hs + 2) * (cin + cin2) * (wt_eff + 2) * n
            acc_bytes = cout * wt_eff * n * 4
            out_bytes = 2 * hs * cout * wt_eff * n
            if in_bytes + acc_bytes + out_bytes <= budget:
                return hs, wt_eff
    return 1, min(8, w)


# ------------------------------------------------------- conv3x3 + requant


def _make_qconv_kernel(H, W, Cin, Cout, N, Hs, Wt, relu, split, Cin2=0):
    """Kernel body factory. ``split``: two inputs, separately dequantized
    partial sums added before bias/ReLU (the concat-free decoder conv1)."""

    def kernel(*refs):
        if split:
            (x_ref, x2_ref, w_ref, w2_ref, a_ref, a2_ref, b_ref, os_ref,
             o_ref, acc, acc2) = refs
        else:
            x_ref, w_ref, a_ref, b_ref, os_ref, o_ref, acc = refs
        i = pl.program_id(0)
        j = pl.program_id(1)
        rows = i * Hs - 1 + jax.lax.broadcasted_iota(
            jnp.int32, (Hs + 2, 1, 1, 1), 0)
        cols = j * Wt - 1 + jax.lax.broadcasted_iota(
            jnp.int32, (1, 1, Wt + 2, 1), 2)
        ok = (rows >= 0) & (rows < H) & (cols >= 0) & (cols < W)
        x = jnp.where(ok, x_ref[:], 0)
        if split:
            x2 = jnp.where(ok, x2_ref[:], 0)

        inv_os = 127.0 / os_ref[0, 0]
        for r in range(Hs):
            k3 = x[r : r + 3].reshape(3 * Cin, Wt + 2, N)
            acc[:] = jnp.zeros_like(acc)
            for dx in range(3):
                acc[:] += jax.lax.dot_general(
                    w_ref[dx], k3[:, dx : dx + Wt, :],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
            y = acc[:].astype(jnp.float32) * a_ref[:].reshape(Cout, 1, 1)
            if split:
                k3b = x2[r : r + 3].reshape(3 * Cin2, Wt + 2, N)
                acc2[:] = jnp.zeros_like(acc2)
                for dx in range(3):
                    acc2[:] += jax.lax.dot_general(
                        w2_ref[dx], k3b[:, dx : dx + Wt, :],
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32,
                    )
                y = y + acc2[:].astype(jnp.float32) * a2_ref[:].reshape(Cout, 1, 1)
            y = y + b_ref[:].reshape(Cout, 1, 1)
            if relu:
                y = jnp.maximum(y, 0.0)
                o_ref[r] = jnp.clip(jnp.round(y * inv_os), 0, 127
                                    ).astype(jnp.int8)
            else:
                o_ref[r] = jnp.clip(jnp.round(y * inv_os), -127, 127
                                    ).astype(jnp.int8)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("relu", "interpret", "tiles"),
)
def qconv3x3_requant(x, wpack, a, bias, out_scale, *, relu=True,
                     interpret=None, tiles=None):
    """int8 3×3 SAME conv → f32 epilogue → s8, in (H, Cin, W, N) layout.

    ``a``: (Cout,) f32 = s_in · w_scale (dequant factor per out channel).
    ``bias``: (Cout,) f32. ``out_scale``: scalar f32 — output requantizes to
    ``clip(round(relu(y)·127/out_scale))`` exactly like quant._requant.
    """
    if interpret is None:
        interpret = _interpret_default()
    H, Cin, W, N = x.shape
    Cout = wpack.shape[1]
    Hs, Wt = tiles or _plan_tiles(H, Cin, W, N, Cout)
    E = pl.Element
    kern = _make_qconv_kernel(H, W, Cin, Cout, N, Hs, Wt, relu, split=False)
    return pl.pallas_call(
        kern,
        grid=(H // Hs, W // Wt),
        in_specs=[
            pl.BlockSpec((E(Hs + 2, (1, 1)), E(Cin), E(Wt + 2, (1, 1)), E(N)),
                         lambda i, j: (i * Hs, 0, j * Wt, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, Cout, 3 * Cin), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Cout, 1), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Cout, 1), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((Hs, Cout, Wt, N), lambda i, j: (i, 0, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((H, Cout, W, N), jnp.int8),
        scratch_shapes=[pltpu.VMEM((Cout, Wt, N), jnp.int32)],
        interpret=interpret,
    )(x, wpack, a.astype(jnp.float32).reshape(-1, 1),
      bias.astype(jnp.float32).reshape(-1, 1),
      jnp.asarray(out_scale, jnp.float32).reshape(1, 1))


@functools.partial(
    jax.jit,
    static_argnames=("relu", "interpret", "tiles"),
)
def qconv3x3_split_requant(x, x2, wpack, wpack2, a, a2, bias, out_scale, *,
                           relu=True, interpret=None, tiles=None):
    """Fused concat-free decoder conv1: two int8 inputs (upsample path and
    skip path), separately dequantized, summed, bias+ReLU, requantized —
    one kernel instead of XLA's conv→s32 HBM→add→requant chain."""
    if interpret is None:
        interpret = _interpret_default()
    H, Cin, W, N = x.shape
    Cin2 = x2.shape[1]
    Cout = wpack.shape[1]
    Hs, Wt = tiles or _plan_tiles(H, Cin, W, N, Cout, cin2=Cin2)
    E = pl.Element
    kern = _make_qconv_kernel(H, W, Cin, Cout, N, Hs, Wt, relu, split=True,
                              Cin2=Cin2)

    def _xspec(c):
        return pl.BlockSpec((E(Hs + 2, (1, 1)), E(c), E(Wt + 2, (1, 1)), E(N)),
                            lambda i, j: (i * Hs, 0, j * Wt, 0),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        kern,
        grid=(H // Hs, W // Wt),
        in_specs=[
            _xspec(Cin),
            _xspec(Cin2),
            pl.BlockSpec((3, Cout, 3 * Cin), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, Cout, 3 * Cin2), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Cout, 1), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Cout, 1), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Cout, 1), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((Hs, Cout, Wt, N), lambda i, j: (i, 0, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((H, Cout, W, N), jnp.int8),
        scratch_shapes=[
            pltpu.VMEM((Cout, Wt, N), jnp.int32),
            pltpu.VMEM((Cout, Wt, N), jnp.int32),
        ],
        interpret=interpret,
    )(x, x2, wpack, wpack2, a.astype(jnp.float32).reshape(-1, 1),
      a2.astype(jnp.float32).reshape(-1, 1),
      bias.astype(jnp.float32).reshape(-1, 1),
      jnp.asarray(out_scale, jnp.float32).reshape(1, 1))


# ----------------------------------------------------------------- maxpool


@functools.partial(jax.jit, static_argnames=("interpret",))
def max_pool2_hcwn(x, interpret=None):
    """2×2 stride-2 max pool on int8 (H, C, W, N) → (H/2, C, W/2, N)."""
    if interpret is None:
        interpret = _interpret_default()
    H, C, W, N = x.shape

    def kernel(x_ref, o_ref):
        a = jnp.maximum(x_ref[0], x_ref[1])            # (C, Wt, N)
        a = a.reshape(C, a.shape[1] // 2, 2, N)
        o_ref[0] = jnp.max(a, axis=2)

    wt = W
    while 2 * (2 * C * wt * N) + C * (wt // 2) * N > (10 << 20) and wt > 8:
        wt //= 2

    return pl.pallas_call(
        kernel,
        grid=(H // 2, W // wt),
        in_specs=[pl.BlockSpec((2, C, wt, N), lambda i, j: (i, 0, j, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, C, wt // 2, N), lambda i, j: (i, 0, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((H // 2, C, W // 2, N), jnp.int8),
        interpret=interpret,
    )(x)


# ------------------------------------------------- transpose-conv upsample


def pack_wup(kernel_hwio):
    """(2,2,Cin,Cout) int8 — ``q["up"]["kernel"]`` as stored — → (2dy, 2dx,
    Cout, Cin) GEMM lhs. Orientation note: for k=2 s=2 VALID,
    ``lax.conv_transpose(x, k[::-1,::-1])`` (quant._conv_transpose2x2_i8)
    reduces to ``y[2h+dy, 2w+dx] = Σ_ci x[h,w,ci]·k[dy,dx,ci,co]`` — the
    explicit flip cancels conv_transpose's implicit rotation (pinned by
    tests/unit/test_qconv_pallas.py)."""
    k = np.asarray(kernel_hwio)
    return jnp.asarray(np.transpose(k, (0, 1, 3, 2)))


@functools.partial(jax.jit, static_argnames=("interpret",))
def qupsample2x2_requant(x, wup, a, bias, out_scale, interpret=None):
    """int8 2×2 stride-2 transpose conv + symmetric requant (no ReLU —
    reference graph applies none here, unet_model.py:38-48 / quant.py).

    ``x``: (H, Cin, W, N) s8 → (2H, Cout, 2W, N) s8.
    ``wup``: (2,2,Cout,Cin) from :func:`pack_wup`. ``a`` = s_in·w_scale.
    y[2h+dy, 2w+dx] = Σ_ci K[dy,dx,ci,co]·x[h,w,ci]  (non-overlapping taps).
    """
    if interpret is None:
        interpret = _interpret_default()
    H, Cin, W, N = x.shape
    Cout = wup.shape[2]

    wt = W
    while 2 * (Cin * wt * N) + 2 * (2 * Cout * 2 * wt * N) > (10 << 20) and wt > 8:
        wt //= 2

    def kernel(x_ref, w_ref, a_ref, b_ref, os_ref, o_ref):
        row = x_ref[0]                                  # (Cin, Wt, N)
        inv_os = 127.0 / os_ref[0, 0]
        for dy in range(2):
            parts = []
            for dx in range(2):
                acc = jax.lax.dot_general(
                    w_ref[dy, dx], row,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )                                       # (Cout, Wt, N)
                y = acc.astype(jnp.float32) * a_ref[:].reshape(Cout, 1, 1)
                y = y + b_ref[:].reshape(Cout, 1, 1)
                parts.append(y)
            inter = jnp.stack(parts, axis=2)            # (Cout, Wt, 2, N)
            inter = inter.reshape(Cout, 2 * row.shape[1], N)
            o_ref[dy] = jnp.clip(jnp.round(inter * inv_os), -127, 127
                                 ).astype(jnp.int8)

    return pl.pallas_call(
        kernel,
        grid=(H, W // wt),
        in_specs=[
            pl.BlockSpec((1, Cin, wt, N), lambda i, j: (i, 0, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 2, Cout, Cin), lambda i, j: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Cout, 1), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Cout, 1), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((2, Cout, 2 * wt, N), lambda i, j: (i, 0, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2 * H, Cout, 2 * W, N), jnp.int8),
        interpret=interpret,
    )(x, wup, a.astype(jnp.float32).reshape(-1, 1),
      bias.astype(jnp.float32).reshape(-1, 1),
      jnp.asarray(out_scale, jnp.float32).reshape(1, 1))


# ------------------------------------------------------------ fused head


def _head_kernel_hcwn(x_ref, w_ref, rowmax_ref, colmax_ref):
    """Row h: logits (3, W, N) = wᵀ(3,C) @ x(C, W, N); reduce to maxima."""
    h = pl.program_id(0)
    x = x_ref[0].astype(jnp.bfloat16)                   # (C, W, N)
    logits = jax.lax.dot_general(
        w_ref[:], x,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                   # (3, W, N)
    rowmax_ref[0] = jnp.max(logits, axis=1)

    @pl.when(h == 0)
    def _():
        colmax_ref[:] = logits

    @pl.when(h > 0)
    def _():
        colmax_ref[:] = jnp.maximum(colmax_ref[:], logits)


@functools.partial(jax.jit, static_argnames=("interpret",))
def head_rowcol_max_hcwn(x, w, act_scale, interpret=None):
    """(H, C, W, N) s8 final activations → bias-free logit row/col maxima.

    Same contract as ops.pallas_head.head_rowcol_max but for the Pallas
    graph's native layout. Returns (row_max (N,H,3), col_max (N,W,3)) f32.
    """
    if interpret is None:
        interpret = _interpret_default()
    H, C, W, N = x.shape
    wf = (w.astype(jnp.float32) * act_scale).astype(jnp.bfloat16).T  # (3, C)

    rowmax, colmax = pl.pallas_call(
        _head_kernel_hcwn,
        grid=(H,),
        in_specs=[
            pl.BlockSpec((1, C, W, N), lambda h: (h, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, C), lambda h: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 3, N), lambda h: (h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, W, N), lambda h: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((H, 3, N), jnp.float32),
            jax.ShapeDtypeStruct((3, W, N), jnp.float32),
        ],
        interpret=interpret,
    )(x, wf)
    return (
        jnp.transpose(rowmax, (2, 0, 1)),   # (N, H, 3)
        jnp.transpose(colmax, (2, 1, 0)),   # (N, W, 3)
    )
