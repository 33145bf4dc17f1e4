"""Pallas fused head (ops/pallas_head): numerics + box-decision parity.

Runs the kernel in interpreter mode on CPU (tests/conftest.py forces the
cpu platform); the TPU A/B throughput comparison lives in
scripts/bench_int8_serving.py / docs/PERFORMANCE.md.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from twinvoice_tpu.infer.postprocess import (
    bbox_from_logits_fast,
    probability_to_logit_thresholds,
)
from twinvoice_tpu.ops.pallas_head import bbox_from_rowcol_max, head_rowcol_max


def _reference(h_s8, w, scale):
    x = h_s8.astype(np.float32) * scale
    logits = np.einsum("bhwc,co->bhwo", x, w)
    return logits.max(2), logits.max(1)  # row_max (B,H,3), col_max (B,W,3)


def test_head_rowcol_max_matches_dense_conv(rng):
    b, hh, ww, c = 2, 16, 24, 8
    h_s8 = rng.integers(-127, 128, (b, hh, ww, c), dtype=np.int8)
    w = rng.normal(0, 0.2, (c, 3)).astype(np.float32)
    scale = np.float32(0.037)

    row_ref, col_ref = _reference(h_s8, w, scale)
    row, col = head_rowcol_max(
        jnp.asarray(h_s8), jnp.asarray(w), scale, interpret=True
    )
    # bf16 weight rounding: relative tolerance ~1e-2
    np.testing.assert_allclose(np.asarray(row), row_ref, rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(col), col_ref, rtol=2e-2, atol=2e-2)


def test_head_rowcol_max_mosaic_semantics_multitile(rng):
    """Run the kernel under the MOSAIC interpreter (pltpu.InterpretParams),
    which models TPU grid/double-buffer semantics and rejects illegal output-
    block revisiting — the generic interpreter keeps the whole array live and
    cannot catch it. Regression for ADVICE r2 (high): the old formulation
    revisited the per-j colmax block across the outer grid dim h, so on real
    TPU col_max contained stale tiles. W=256 → four 64-col tiles, so the
    colmax accumulation actually crosses tiles here.

    f32 compute: the CPU dot thunk can't do bf16×bf16→f32 (known box limit);
    the grid semantics under test are dtype-independent."""
    from jax.experimental.pallas import tpu as pltpu

    from twinvoice_tpu.ops.pallas_head import _head_rowcol_max

    b, hh, ww, c = 8, 16, 256, 32
    h_s8 = rng.integers(-127, 128, (b, hh, ww, c), dtype=np.int8)
    w = rng.normal(0, 0.2, (c, 3)).astype(np.float32)
    scale = np.float32(0.037)

    row_ref, col_ref = _reference(h_s8, w, scale)
    row, col = _head_rowcol_max(
        jnp.asarray(h_s8), jnp.asarray(w), scale,
        interpret=pltpu.InterpretParams(), compute_dtype=jnp.float32,
    )
    np.testing.assert_allclose(np.asarray(row), row_ref, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(col), col_ref, rtol=1e-4, atol=1e-4)


def test_bbox_from_rowcol_max_matches_bbox_from_logits_fast(rng):
    """Box combination logic ⟷ the per-image reference, on exact f32 maxima."""
    b, hh, ww, c = 4, 32, 48, 3
    logits = rng.normal(0, 2.0, (b, hh, ww, c)).astype(np.float32)
    thr = probability_to_logit_thresholds((0.25, 0.40, 0.30))

    boxes_ref, valid_ref = jax.vmap(
        lambda lg: bbox_from_logits_fast(lg, thr)
    )(jnp.asarray(logits))

    row_max = jnp.asarray(logits.max(2))
    col_max = jnp.asarray(logits.max(1))
    boxes, valid = bbox_from_rowcol_max(row_max, col_max, thr)

    np.testing.assert_array_equal(np.asarray(valid), np.asarray(valid_ref))
    np.testing.assert_array_equal(np.asarray(boxes), np.asarray(boxes_ref))


def test_bias_folding_equivalence(rng):
    """max(x·w) + bias > t  ⟺  max(x·w) > t - bias (the caller's contract)."""
    b, hh, ww, c = 2, 16, 16, 4
    h_s8 = rng.integers(-127, 128, (b, hh, ww, c), dtype=np.int8)
    w = rng.normal(0, 0.2, (c, 3)).astype(np.float32)
    bias = rng.normal(0, 1.0, (3,)).astype(np.float32)
    scale = np.float32(0.05)
    thr = np.asarray(probability_to_logit_thresholds((0.25, 0.40, 0.30)))

    x = h_s8.astype(np.float32) * scale
    logits = np.einsum("bhwc,co->bhwo", x, w) + bias
    boxes_ref, valid_ref = jax.vmap(
        lambda lg: bbox_from_logits_fast(lg, jnp.asarray(thr))
    )(jnp.asarray(logits))

    row_max, col_max = _reference(h_s8, w, scale)  # bias-free maxima
    boxes, valid = bbox_from_rowcol_max(
        jnp.asarray(row_max), jnp.asarray(col_max), thr - bias
    )
    np.testing.assert_array_equal(np.asarray(valid), np.asarray(valid_ref))
    np.testing.assert_array_equal(np.asarray(boxes), np.asarray(boxes_ref))


def test_head_kernel_empty_and_full_activations():
    """All-zero and all-max activations produce consistent maxima."""
    b, hh, ww, c = 1, 8, 8, 8
    w = np.full((c, 3), 0.1, np.float32)
    zero = np.zeros((b, hh, ww, c), np.int8)
    row, col = head_rowcol_max(jnp.asarray(zero), jnp.asarray(w),
                               np.float32(0.1), interpret=True)
    assert np.allclose(np.asarray(row), 0.0) and np.allclose(np.asarray(col), 0.0)

    full = np.full((b, hh, ww, c), 127, np.int8)
    row, col = head_rowcol_max(jnp.asarray(full), jnp.asarray(w),
                               np.float32(0.1), interpret=True)
    expect = 127 * 0.1 * 0.1 * c
    np.testing.assert_allclose(np.asarray(row), expect, rtol=2e-2)
