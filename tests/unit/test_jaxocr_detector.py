"""Text-line detection (ocr/jaxocr/detector) — the EasyOCR-"CRAFT" analogue.

Ground truth comes from the synthetic renderer's field boxes; detection
must cover them and full-page reading must surface the invoice number.
"""

import numpy as np
import pytest

from twinvoice_tpu.data.synthetic import render_invoice
from twinvoice_tpu.ocr.jaxocr import detector


def _covered(gt, boxes, min_frac=0.7):
    gx1, gy1, gx2, gy2 = gt
    area = max(1, (gx2 - gx1) * (gy2 - gy1))
    best = 0.0
    for x1, y1, x2, y2 in boxes:
        iw = max(0, min(gx2, x2) - max(gx1, x1))
        ih = max(0, min(gy2, y2) - max(gy1, y1))
        best = max(best, iw * ih / area)
    return best >= min_frac


@pytest.fixture(scope="module")
def invoice():
    img, boxes = render_invoice("AB12345678", "2025-09-09", 543, seed=3)
    return img, boxes


def test_detect_lines_cover_field_boxes(invoice):
    img, gt = invoice
    boxes = detector.detect_lines(img)
    assert len(boxes) >= 3
    for field, box in gt.items():
        assert _covered(box, boxes), (field, box, boxes)


def test_detect_lines_rejects_qr_blocks(invoice):
    """The two QR codes are tall square blobs — not text lines."""
    img, _ = invoice
    arr = np.asarray(img.convert("L"))
    h, w = arr.shape
    for x1, y1, x2, y2 in detector.detect_lines(img):
        bw, bh = x2 - x1, y2 - y1
        assert bh <= 2.5 * bw + 12, "vertical strip leaked through"
        assert bh <= 0.25 * h + 12, "page-scale blob leaked through"


def test_detect_lines_empty_page():
    blank = np.full((320, 240), 250, np.uint8)
    assert detector.detect_lines(blank) == []


def test_read_page_finds_invoice_number(invoice):
    from twinvoice_tpu.ocr.jaxocr.engine import JaxOcrEngine

    eng = JaxOcrEngine()
    if not eng.available():
        pytest.skip("bundled jaxocr weights unavailable")
    img, _ = invoice
    results = detector.read_page(img, eng)
    assert results, "no lines recognized"
    joined = " ".join(r.text for _, r in results).replace("-", "").replace(" ", "")
    assert "AB12345678" in joined, joined


def test_read_text_join(invoice):
    from twinvoice_tpu.ocr.jaxocr.engine import JaxOcrEngine

    if not JaxOcrEngine().available():
        pytest.skip("bundled jaxocr weights unavailable")
    img, _ = invoice
    text = detector.read_text(img)
    assert isinstance(text, str) and len(text) >= 8


class _BlindSegmenter:
    """Segmenter stand-in that finds nothing — forces the fallback."""

    def segment_pil(self, pil_img):
        return {}, {"invoice_no": None, "date": None, "total_amount": None}


def test_fusion_full_page_fallback_recovers_invoice_no(invoice):
    from twinvoice_tpu.config import FusionConfig
    from twinvoice_tpu.fusion.extract import InvoiceExtractor
    from twinvoice_tpu.ocr.jaxocr.engine import JaxOcrEngine

    eng = JaxOcrEngine()
    if not eng.available():
        pytest.skip("bundled jaxocr weights unavailable")
    img, _ = invoice
    ex = InvoiceExtractor(
        _BlindSegmenter(), None, engines=[eng],
        cfg=FusionConfig(use_qr=False, auto_rotate=False),
    )
    meta, items, _ = ex.extract(img)
    assert meta["invoice_no"] == "AB12345678"
    assert meta["source"] == "full_page_ocr"

    # fallback disabled -> nothing found
    ex2 = InvoiceExtractor(
        _BlindSegmenter(), None, engines=[eng],
        cfg=FusionConfig(use_qr=False, auto_rotate=False,
                         full_page_fallback=False),
    )
    meta2, _, _ = ex2.extract(img)
    assert meta2["invoice_no"] is None


def test_textness_head_shapes_and_roundtrip(tmp_path):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from twinvoice_tpu.ocr.jaxocr import textness

    p = textness.init_textness(jax.random.key(0))
    assert textness.n_params(p) <= 100_000  # VERDICT r2 #8 budget
    x = jnp.zeros((1, 64, 128, 1), jnp.float32)
    assert textness.textness_apply(p, x).shape == (1, 16, 32, 1)

    path = str(tmp_path / "t.npz")
    textness.save_textness(path, p)
    p2 = textness.load_textness(path)
    for a, b in zip(jax.tree.leaves(p), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert textness.load_textness(str(tmp_path / "missing.npz")) is None


def test_detect_lines_learned_method(tmp_path, monkeypatch):
    """A quickly-fitted head must drive detect_lines through the learned
    path end-to-end (map → components → boxes)."""
    import numpy as np

    from twinvoice_tpu.ocr.jaxocr import detector, textness

    params = textness.train(steps=60, bs=8, cache_batches=4, seed=1,
                            log=lambda *a: None)
    monkeypatch.setattr(detector, "_learned_params", params)
    rng = np.random.default_rng(3)
    gray, mask = textness.render_textpage(rng, 256, severity=0.0)
    boxes = detector.detect_lines(gray, method="learned")
    assert isinstance(boxes, list)  # runs end-to-end; quality is the
    # train_textness.py A/B's job, not this smoke test's


def test_detect_lines_hybrid_method(tmp_path, monkeypatch):
    """Hybrid = classical boxes verified by the learned logit map, plus
    learned-only boxes. With a quickly-fitted head it must run end-to-end
    and, on a clean page, find at least what classical verification keeps."""
    import numpy as np

    from twinvoice_tpu.ocr.jaxocr import detector, textness

    params = textness.train(steps=60, bs=8, cache_batches=4, seed=1,
                            log=lambda *a: None)
    monkeypatch.setattr(detector, "_learned_params", params)
    rng = np.random.default_rng(3)
    gray, mask = textness.render_textpage(rng, 256, severity=0.0)
    boxes = detector.detect_lines(gray, method="hybrid")
    assert isinstance(boxes, list)
    # every hybrid box is a plausible line box within the page
    for (x1, y1, x2, y2) in boxes:
        assert 0 <= x1 < x2 <= 256 and 0 <= y1 < y2 <= 256


def test_detect_lines_auto_prefers_hybrid(monkeypatch):
    """'auto' resolves to hybrid when weights are bundled, classical when
    not — both must run without error."""
    import numpy as np

    from twinvoice_tpu.ocr.jaxocr import detector, textness

    rng = np.random.default_rng(5)
    gray, _ = textness.render_textpage(rng, 256, severity=0.0)
    monkeypatch.setattr(detector, "_learned_params", None)
    b_classical = detector.detect_lines(gray, method="auto")
    params = textness.init_textness(__import__("jax").random.key(0))
    monkeypatch.setattr(detector, "_learned_params", params)
    b_hybrid = detector.detect_lines(gray, method="auto")
    assert isinstance(b_classical, list) and isinstance(b_hybrid, list)
