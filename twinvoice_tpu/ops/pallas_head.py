"""Pallas fused serving head: dequant → 1×1 out-conv → row/col max.

Why this kernel exists (VERDICT r1 #2, docs/PERFORMANCE.md roofline): in the
int8 serving graph the final 1×1 conv (64→3 logits, ops/conv.py conv1x1 =
the reference's ``out_conv``, unet_model.py:50) is the single hottest XLA
fusion at batch 128 — ~24 ms/iter. The MXU work is trivial (M=3), the cost
is materializing the f32 (B,512,512,3) logits tensor (402 MB) plus reading
it back for the bbox max-reductions (infer/postprocess.bbox_from_logits_fast).
The serving box path only ever consumes ``max(logits)`` over rows and
columns, so this kernel computes the conv and both reductions in one pass
over the int8 activations and never writes logits to HBM at all:

    h_s8 (B,H,W,C) ──bitcast──> (H,W,C,B) ──per-row GEMM──> logits row
         (3,W,B) ──max W──> row_max (H,3,B);  running max ──> col_max (3,W,B)

The (B,H,W,C)→(H,W,C,B) transpose is free: XLA already lays NHWC activations
out batch-minor on TPU ({0,3,2,1}), so the logical transpose is a bitcast.

Numerics: the GEMM runs bf16×bf16 with f32 accumulation. int8 values are
exact in bf16; the folded weight (w·act_scale) is rounded to bf16, so logits
can differ from the f32 reference path by ~1e-2 relative — inside the int8
mode's existing quantization error budget (infer/quant.py docstring).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _head_kernel(x_ref, w_ref, rowmax_ref, colmax_ref):
    """Grid step = (image row h, column tile j).

    x_ref:      (1, Wt, C, B) int8 — column tile of an activations row
    w_ref:      (C, 3) bf16 — out-conv weight with the activation scale folded
    rowmax_ref: (1, 3, B) f32 — running max over column tiles (revisited per j,
                the INNERMOST grid dim, so revisits are consecutive — legal)
    colmax_ref: (3, W, B) f32 — FULL-array accumulator block (constant index
                map ⇒ one VMEM buffer resident across the whole grid). The
                previous formulation used a per-j block revisited across the
                outer dim h; Mosaic double-buffers non-consecutively-revisited
                output blocks, so other column tiles' stale contents leaked in
                (ADVICE r2 high). ~0.8 MB at W=512, B=128 — cheap to keep live.

    W is tiled because a full 512-col row of bf16 activations at batch 128
    blows the kernel's VMEM stack (~80 MB measured); per-tile intermediates
    stay a few MB.
    """
    h = pl.program_id(0)
    j = pl.program_id(1)
    x = x_ref[0].astype(w_ref.dtype)           # (Wt, C, B)
    w = w_ref[:]                               # (C, 3)
    # (3, C) @ (Wt, C, B) contracting C -> (3, Wt, B); bias is added by the
    # caller to the thresholds instead (max(x)+b > t  ⟺  max(x) > t-b).
    logits = jax.lax.dot_general(
        w.T, x,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                           # (3, Wt, B)
    tile_max = jnp.max(logits, axis=1)          # (3, B)

    @pl.when(j == 0)
    def _():
        rowmax_ref[0] = tile_max

    @pl.when(j > 0)
    def _():
        rowmax_ref[0] = jnp.maximum(rowmax_ref[0], tile_max)

    wt = logits.shape[1]
    cols = pl.dslice(j * wt, wt)

    @pl.when(h == 0)
    def _():
        colmax_ref[:, cols, :] = logits

    @pl.when(h > 0)
    def _():
        colmax_ref[:, cols, :] = jnp.maximum(colmax_ref[:, cols, :], logits)


@functools.partial(jax.jit, static_argnames=("interpret", "compute_dtype"))
def _head_rowcol_max(h_nhwc_s8, w, act_scale, interpret=False,
                     compute_dtype=jnp.bfloat16):
    """Fused out-conv + bbox reductions for the int8 serving path.

    ``h_nhwc_s8``: (B, H, W, C) int8 final decoder activations.
    ``w``: (C, Cout=3) f32 out-conv kernel (bias handled by the caller:
    fold it into the logit thresholds, ``max(x·w) + b > t ⟺ max > t - b``).
    ``act_scale``: scalar f32 dequant scale of ``h``.

    Returns ``(row_max (B, H, 3) f32, col_max (B, W, 3) f32)`` of the
    *bias-free* logits.
    """
    b, hh, ww, c = h_nhwc_s8.shape
    x = jnp.transpose(h_nhwc_s8, (1, 2, 3, 0))  # (H, W, C, B) — bitcast on TPU
    wf = (w.astype(jnp.float32) * act_scale).astype(compute_dtype)

    wt = ww
    while wt > 64 and wt % 2 == 0:
        wt //= 2

    rowmax, colmax = pl.pallas_call(
        _head_kernel,
        grid=(hh, ww // wt),
        in_specs=[
            pl.BlockSpec((1, wt, c, b), lambda h, j: (h, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 3), lambda h, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 3, b), lambda h, j: (h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, ww, b), lambda h, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((hh, 3, b), jnp.float32),
            jax.ShapeDtypeStruct((3, ww, b), jnp.float32),
        ],
        interpret=interpret,
    )(x, wf)

    return (
        jnp.transpose(rowmax, (2, 0, 1)),  # (B, H, 3)
        jnp.transpose(colmax, (2, 1, 0)),  # (B, W, 3)
    )


def head_rowcol_max(h_nhwc_s8, w, act_scale, interpret=None):
    """See :func:`_head_rowcol_max`. ``interpret=None`` auto-selects the
    Pallas interpreter off-TPU (CPU tests / virtual-device meshes)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _head_rowcol_max(h_nhwc_s8, w, act_scale, interpret=interpret)


def bbox_from_rowcol_max(row_max, col_max, logit_thresholds):
    """Batched bbox from precomputed row/col logit maxima.

    Same decisions as ``vmap(bbox_from_logits_fast)`` (postprocess.py): a row
    (column) is active iff its max logit exceeds the per-class threshold.

    ``row_max``: (B, H, C) f32; ``col_max``: (B, W, C) f32 — *bias-free*
    logit maxima; fold the out-conv bias into ``logit_thresholds`` (t - b).
    Returns ``(boxes (B, C, 4) int32 [x1,y1,x2,y2] inclusive, valid (B, C))``.
    """
    bsz, h, c = row_max.shape
    w = col_max.shape[1]
    thr = jnp.asarray(logit_thresholds, jnp.float32)
    rows = row_max > thr                                   # (B, H, C)
    cols = col_max > thr                                   # (B, W, C)
    valid = jnp.any(rows, axis=1)                          # (B, C)
    yi = jax.lax.broadcasted_iota(jnp.int32, (bsz, h, c), 1)
    xi = jax.lax.broadcasted_iota(jnp.int32, (bsz, w, c), 1)
    y1 = jnp.min(jnp.where(rows, yi, h), axis=1)
    y2 = jnp.max(jnp.where(rows, yi, -1), axis=1)
    x1 = jnp.min(jnp.where(cols, xi, w), axis=1)
    x2 = jnp.max(jnp.where(cols, xi, -1), axis=1)
    return jnp.stack([x1, y1, x2, y2], axis=-1), valid
