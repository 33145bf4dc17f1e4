"""Dataset + labelme builder tests (reference dataset.py / rescue…py behavior)."""

import json
import os

import numpy as np
import pytest

from twinvoice_tpu.data.dataset import ArrayDataset, load_invoice_dataset, synthetic_dataset
from twinvoice_tpu.data.labelme import (
    build_dataset_from_labelme,
    fill_polygon,
    rasterize_labelme,
)


def test_fill_polygon_square():
    m = fill_polygon([(2, 2), (8, 2), (8, 8), (2, 8)], 10, 10)
    assert m[5, 5] and not m[0, 0] and not m[9, 9]
    assert m.sum() == 36  # pixel centers strictly inside [2,8)²


def test_fill_polygon_matches_pil_oracle(rng):
    from PIL import Image, ImageDraw

    for _ in range(5):
        # convex (angle-sorted) polygons: labelme shapes are simple polygons,
        # and self-intersecting ones have ambiguous fill conventions
        raw = [(float(rng.uniform(1, 60)), float(rng.uniform(1, 60))) for _ in range(6)]
        cx = sum(p[0] for p in raw) / 6
        cy = sum(p[1] for p in raw) / 6
        import math

        pts = sorted(raw, key=lambda p: math.atan2(p[1] - cy, p[0] - cx))
        ours = fill_polygon(pts, 64, 64)
        canvas = Image.new("L", (64, 64), 0)
        ImageDraw.Draw(canvas).polygon(pts, fill=255)
        theirs = np.asarray(canvas) > 0
        union = (ours | theirs).sum()
        if union == 0:
            continue
        iou = (ours & theirs).sum() / union
        assert iou > 0.9, iou  # conventions differ by edge pixels only


def test_rasterize_channels():
    shapes = [
        {"label": "invoice_no", "points": [[0, 0], [10, 0], [10, 10], [0, 10]]},
        {"label": "total_amount", "points": [[20, 20], [30, 20], [30, 30], [20, 30]]},
        {"label": "unknown_label", "points": [[0, 0], [5, 0], [5, 5]]},
    ]
    m = rasterize_labelme(shapes, (40, 40))
    assert m[5, 5, 0] == 255 and m[25, 25, 2] == 255
    assert m[5, 5, 1] == 0 and m[25, 25, 0] == 0


def test_build_and_load_roundtrip(tmp_path, rng):
    import cv2

    jd = tmp_path / "json"
    im = tmp_path / "images"
    jd.mkdir(); im.mkdir()
    img = rng.integers(0, 255, (100, 80, 3), dtype=np.uint8)
    cv2.imwrite(str(im / "sample.jpg"), img)
    meta = {
        "imageWidth": 40,  # nominal half-size: polygons must scale ×2
        "imageHeight": 50,
        "shapes": [
            {"label": "date", "points": [[5, 5], [35, 5], [35, 20], [5, 20]]}
        ],
    }
    (jd / "sample.json").write_text(json.dumps(meta))
    done, missing = build_dataset_from_labelme(
        str(jd), str(im), str(tmp_path / "fi"), str(tmp_path / "fm"),
        train_size=(64, 64), log=lambda *_: None,
    )
    assert done == ["sample"] and missing == []

    ds = load_invoice_dataset(str(tmp_path / "fi"), str(tmp_path / "fm"))
    assert len(ds) == 1
    assert ds.images.shape == (1, 64, 64, 3)
    assert ds.masks.shape == (1, 64, 64, 3)
    assert ds.masks[0, :, :, 1].max() == 255  # date channel populated
    assert ds.masks[0, :, :, 0].max() == 0


def test_missing_image_reported(tmp_path):
    jd = tmp_path / "json"; jd.mkdir()
    (jd / "ghost.json").write_text(json.dumps({"imageWidth": 1, "imageHeight": 1, "shapes": []}))
    done, missing = build_dataset_from_labelme(
        str(jd), str(tmp_path), str(tmp_path / "a"), str(tmp_path / "b"), log=lambda *_: None
    )
    assert done == [] and missing == ["ghost"]


def test_batches_fixed_shape(rng):
    ds = synthetic_dataset(n=10, size=32)
    shapes = [b[0].shape for b in ds.batches(4, rng=rng)]
    assert shapes == [(4, 32, 32, 3)] * 3  # tail wrapped to full batch
    imgs, masks = next(ds.batches(4, rng=rng))
    assert imgs.max() <= 1.0 and set(np.unique(masks)) <= {0.0, 1.0}


def test_split_deterministic():
    ds = synthetic_dataset(n=10, size=16)
    tr1, va1 = ds.split(0.3, seed=5)
    tr2, va2 = ds.split(0.3, seed=5)
    assert len(va1) == 3 and len(tr1) == 7
    assert tr1.names == tr2.names


def test_ink_anchored_gt_convention():
    """The v4 ground-truth convention: each field box's vertical extent
    hugs the rendered ink with GT_INK_MARGIN of whitespace, independent of
    the typeface's internal metrics (the held-out-font root cause)."""
    import numpy as np

    from twinvoice_tpu.data.synthetic import (
        GT_INK_MARGIN, heldout_fonts, render_invoice, train_fonts)

    for font in (train_fonts()[0], heldout_fonts()[0]):
        img, boxes = render_invoice("AB12345678", "2024-01-02", 777,
                                    seed=11, font_path=font)
        arr = np.asarray(img.convert("L"))
        for field, (x1, y1, x2, y2) in boxes.items():
            rows = np.where((arr[:, x1:x2] < 128).any(axis=1))[0]
            rows = rows[(rows >= y1 - 10) & (rows <= y2 + 10)]
            assert len(rows), field
            ink_top, ink_bot = rows.min(), rows.max() + 1
            # box covers the ink, with at most the margin of slack
            assert y1 <= ink_top and ink_bot <= y2, (field, font)
            assert ink_top - y1 <= GT_INK_MARGIN, (field, font)
            assert y2 - ink_bot <= GT_INK_MARGIN, (field, font)


def test_cursor_anchor_still_available():
    from twinvoice_tpu.data.synthetic import render_invoice

    _, ink = render_invoice("AB12345678", "2024-01-02", 7, seed=3)
    _, cur = render_invoice("AB12345678", "2024-01-02", 7, seed=3,
                            gt_anchor="cursor")
    for f in ink:
        # same horizontal extent; ink band nests inside the cursor band
        assert ink[f][0] == cur[f][0] and ink[f][2] == cur[f][2]
        assert cur[f][1] <= ink[f][1] and ink[f][3] <= cur[f][3] + 3
