"""EasyOcrEngine behavioral tests via an injected fake reader (VERDICT r1
weak #6: the adapter's grayscale-prep + join logic was untested because
easyocr can't be installed in this image).

Reference surface being matched: app_camera.py:73 (Reader(['ch_tra','en'],
gpu=False)), 817-833 (grayscale prep, readtext(detail=0), ' '.join)."""

import numpy as np
from PIL import Image

from twinvoice_tpu.ocr.easyocr_engine import EasyOcrEngine


class FakeReader:
    def __init__(self, words=("統一編號", "AB-12345678")):
        self.words = list(words)
        self.calls = []

    def readtext(self, img, detail=0):
        assert detail == 0
        self.calls.append(np.asarray(img))
        return self.words


def test_unavailable_without_reader():
    eng = EasyOcrEngine()  # easyocr not installed in this image
    assert not eng.available()
    assert eng.read(Image.new("RGB", (10, 10))).text == ""


def test_injected_reader_reads_and_joins():
    fake = FakeReader()
    eng = EasyOcrEngine(reader=fake)
    assert eng.available()
    res = eng.read(Image.new("RGB", (40, 20), (200, 180, 160)))
    assert res.text == "統一編號 AB-12345678"
    assert res.engine == "easyocr"
    # grayscale prep happened: the reader saw a 2-D uint8 array
    (seen,) = fake.calls
    assert seen.ndim == 2 and seen.dtype == np.uint8


def test_reader_exception_degrades_to_empty():
    class Boom:
        def readtext(self, img, detail=0):
            raise RuntimeError("ocr crashed")

    eng = EasyOcrEngine(reader=Boom())
    assert eng.read(Image.new("RGB", (10, 10))).text == ""


def test_in_fusion_fallback_chain():
    """A fake EasyOCR engine participates in the priority merge like the
    reference's step-4 fallback (app_camera.py:831-849)."""
    from twinvoice_tpu.config import FusionConfig
    from twinvoice_tpu.fusion.extract import InvoiceExtractor

    class GtSeg:
        def segment_pil(self, img):
            return {}, {"invoice_no": img, "date": None, "total_amount": None}

    eng = EasyOcrEngine(reader=FakeReader(words=("XY-98765432",)))
    ex = InvoiceExtractor(GtSeg(), None, engines=[eng],
                          cfg=FusionConfig(use_qr=False, auto_rotate=False))
    meta, _, _ = ex.extract(Image.new("RGB", (80, 30), (230, 230, 230)))
    assert meta["invoice_no"] == "XY98765432"
    assert meta["source"] in ("easyocr", "merged_ocr")
