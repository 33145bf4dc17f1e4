"""Property test: device bbox scale/pad math vs a literal numpy transcription
of the reference semantics (inference.py:85-117) over random masks/sizes."""

import numpy as np
import jax.numpy as jnp

from twinvoice_tpu.infer.postprocess import bbox_from_probs, scale_and_pad_boxes


def reference_semantics(mask, ow, oh, img_size=32, pad_frac=0.15):
    """The reference's host-side math, transcribed directly."""
    ys, xs = np.where(mask)
    if len(xs) == 0 or len(ys) == 0:
        return None
    mx1, mx2 = xs.min(), xs.max()
    my1, my2 = ys.min(), ys.max()
    scale_x = ow / img_size
    scale_y = oh / img_size
    x1 = int(mx1 * scale_x)
    x2 = int(mx2 * scale_x)
    y1 = int(my1 * scale_y)
    y2 = int(my2 * scale_y)
    pad_x = int((x2 - x1) * pad_frac)
    pad_y = int((y2 - y1) * pad_frac)
    x1 = max(0, x1 - pad_x)
    y1 = max(0, y1 - pad_y)
    x2 = min(ow, x2 + pad_x)
    y2 = min(oh, y2 + pad_y)
    if x2 <= x1 or y2 <= y1:
        return None
    return (x1, y1, x2, y2)


def test_scale_pad_matches_reference_math(rng):
    size = 32
    for trial in range(50):
        prob = np.zeros((size, size, 3), np.float32)
        for c in range(3):
            if rng.random() < 0.2:
                continue  # leave some classes empty
            n = int(rng.integers(1, 20))
            ys = rng.integers(0, size, n)
            xs = rng.integers(0, size, n)
            prob[ys, xs, c] = 1.0
        ow = int(rng.integers(size, 4000))
        oh = int(rng.integers(size, 4000))

        gboxes, valid = bbox_from_probs(jnp.asarray(prob), jnp.asarray([0.5, 0.5, 0.5]))
        boxes, ok = scale_and_pad_boxes(
            gboxes, valid, jnp.asarray([ow, oh], jnp.int32), size, 0.15
        )
        boxes = np.asarray(boxes)
        ok = np.asarray(ok)

        for c in range(3):
            ref = reference_semantics(prob[:, :, c] > 0.5, ow, oh, size)
            if ref is None:
                assert not ok[c], (trial, c)
            else:
                assert ok[c], (trial, c)
                assert tuple(boxes[c]) == ref, (trial, c, tuple(boxes[c]), ref)
