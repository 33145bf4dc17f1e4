"""Parametric Latin stroke font (the typeface-generalization curriculum)."""

import numpy as np
from PIL import Image, ImageDraw

from twinvoice_tpu.ocr.fonts import latin_glyphs as L
from twinvoice_tpu.ocr.jaxocr.charset import CHARSET


def test_covers_field_charset():
    cov = L.coverage()
    missing = [c for c in CHARSET if c not in cov]
    assert not missing, missing


def test_every_glyph_renders_ink():
    for ch in sorted(L.coverage() - {" "}):
        img = Image.new("L", (64, 64), 255)
        L.draw_char(ImageDraw.Draw(img), (8, 8), ch, 40)
        arr = np.asarray(img)
        assert (arr < 128).sum() > 5, f"glyph {ch!r} rendered no ink"


def test_styles_differ_and_line_is_consistent():
    rng = np.random.default_rng(3)
    renders = []
    for _ in range(3):
        style = L.sample_style(rng)
        img = Image.new("L", (320, 48), 255)
        L.draw_text(ImageDraw.Draw(img), (6, 6), "AB1234", 32, style=style)
        renders.append(np.asarray(img).copy())
    # different styles must produce visibly different ink patterns
    assert not np.array_equal(renders[0], renders[1])
    assert not np.array_equal(renders[1], renders[2])


def test_heldout_fonts_disjoint_from_train():
    """r5 leak fix: the held-out tier must not contain any trained font."""
    from twinvoice_tpu.data.synthetic import heldout_fonts, train_fonts

    overlap = set(train_fonts()) & set(heldout_fonts())
    assert not overlap, overlap


def test_make_batch_synth_frac():
    from twinvoice_tpu.ocr.jaxocr import data as D

    rng = np.random.default_rng(0)
    imgs, labels, pad, texts = D.make_batch(8, rng, synth_frac=1.0)
    assert imgs.shape == (8, D.IMG_H, D.IMG_W, 1)
    assert all(t for t in texts)
    assert (imgs < 0.5).any()  # ink present
