"""Pallas fused bbox kernel vs the XLA reference implementation.

Runs in interpret mode on CPU (the compiled path is exercised on TPU by
bench/profile scripts)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from twinvoice_tpu.infer.postprocess import bbox_from_probs
from twinvoice_tpu.ops.pallas.postprocess import bbox_postprocess_pallas

THR = (0.25, 0.40, 0.30)


def _reference(logits):
    prob = jax.nn.sigmoid(logits.astype(jnp.float32))
    boxes, valid = jax.vmap(lambda p: bbox_from_probs(p, jnp.asarray(THR)))(prob)
    return np.asarray(boxes), np.asarray(valid)


def test_matches_reference_random(rng):
    logits = jnp.asarray(rng.standard_normal((2, 32, 64, 3)) * 2, jnp.float32)
    got_b, got_v = bbox_postprocess_pallas(logits, THR, interpret=True)
    ref_b, ref_v = _reference(logits)
    np.testing.assert_array_equal(np.asarray(got_v), ref_v)
    # box values only meaningful where valid
    for i in range(2):
        for c in range(3):
            if ref_v[i, c]:
                np.testing.assert_array_equal(np.asarray(got_b)[i, c], ref_b[i, c])


def test_empty_and_full_masks():
    lo = jnp.full((1, 16, 16, 3), -10.0)
    boxes, valid = bbox_postprocess_pallas(lo, THR, interpret=True)
    assert not np.asarray(valid).any()

    hi = jnp.full((1, 16, 16, 3), 10.0)
    boxes, valid = bbox_postprocess_pallas(hi, THR, interpret=True)
    assert np.asarray(valid).all()
    np.testing.assert_array_equal(np.asarray(boxes)[0, 0], [0, 0, 15, 15])


def test_single_pixel():
    logits = jnp.full((1, 16, 16, 3), -10.0).at[0, 5, 7, 1].set(10.0)
    boxes, valid = bbox_postprocess_pallas(logits, THR, interpret=True)
    v = np.asarray(valid)[0]
    assert list(v) == [False, True, False]
    np.testing.assert_array_equal(np.asarray(boxes)[0, 1], [7, 5, 7, 5])


def test_fast_logit_bbox_matches_prob_bbox(rng):
    from twinvoice_tpu.infer.postprocess import (
        bbox_from_logits_fast,
        probability_to_logit_thresholds,
    )

    logits = jnp.asarray(rng.standard_normal((48, 56, 3)) * 2, jnp.float32)
    prob = jax.nn.sigmoid(logits)
    ref_b, ref_v = bbox_from_probs(prob, jnp.asarray(THR))
    got_b, got_v = bbox_from_logits_fast(logits, probability_to_logit_thresholds(THR))
    np.testing.assert_array_equal(np.asarray(got_v), np.asarray(ref_v))
    np.testing.assert_array_equal(np.asarray(got_b), np.asarray(ref_b))


def test_fast_logit_bbox_bf16_inputs(rng):
    from twinvoice_tpu.infer.postprocess import (
        bbox_from_logits_fast,
        probability_to_logit_thresholds,
    )

    logits = jnp.asarray(rng.standard_normal((16, 16, 3)) * 3, jnp.bfloat16)
    prob = jax.nn.sigmoid(logits.astype(jnp.float32))
    ref_b, ref_v = bbox_from_probs(prob, jnp.asarray(THR))
    got_b, got_v = bbox_from_logits_fast(logits, probability_to_logit_thresholds(THR))
    np.testing.assert_array_equal(np.asarray(got_v), np.asarray(ref_v))
    np.testing.assert_array_equal(np.asarray(got_b), np.asarray(ref_b))
