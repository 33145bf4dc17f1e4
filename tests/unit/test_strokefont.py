"""In-repo CJK stroke font (ocr/fonts): coverage + render sanity.

The font exists because this environment ships no CJK typeface and has no
egress (reference relies on EasyOCR's bundled ch_tra models instead,
app_camera.py:73); recognizable rendering is verified by eye on glyph
sheets — these tests pin the mechanical contracts.
"""

import glob
import os

import numpy as np
import pytest

from twinvoice_tpu.ocr import fonts
from twinvoice_tpu.ocr.fonts import strokefont


def repo_cjk_inventory():
    root = os.path.join(os.path.dirname(__file__), "..", "..")
    chars = set()
    for pat in ("twinvoice_tpu/**/*.py", "tests/**/*.py", "scripts/*.py"):
        for p in glob.glob(os.path.join(root, pat), recursive=True):
            if os.sep + "fonts" + os.sep in p or p.endswith("test_strokefont.py"):
                continue
            text = open(p, encoding="utf-8").read()
            chars |= {c for c in text if 0x4E00 <= ord(c) <= 0x9FFF}
    return chars


def test_covers_every_domain_character():
    missing = sorted(c for c in repo_cjk_inventory() if not fonts.has_glyph(c))
    assert not missing, f"stroke font missing glyphs: {''.join(missing)}"


def test_all_glyphs_render_ink():
    for ch in sorted(strokefont.coverage()):
        img = fonts.render_char(ch, size=48)
        ink = (img < 128).mean()
        assert 0.008 < ink < 0.75, (ch, ink)


def test_distinct_characters_render_distinctly():
    a = fonts.render_char("品", size=48)
    b = fonts.render_char("單", size=48)
    assert (a != b).mean() > 0.05


def test_render_text_mixed_ascii_cjk():
    arr = fonts.render_text("測試A1", size=32)
    assert arr.ndim == 2 and (arr < 128).any()


def test_unknown_char_raises():
    assert not fonts.has_glyph("龘")
    with pytest.raises(KeyError):
        strokefont.glyph_strokes("龘")
