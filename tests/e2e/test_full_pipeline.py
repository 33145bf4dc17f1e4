"""End-to-end: synthetic invoice photo → QR scan → fusion → store → dashboard
(SURVEY.md §4.5). The QR decode here is the real OpenCV backend on our own
rendered QR codes; segmentation/OCR use a stub segmenter + scripted engines
so the test isolates the integration seams rather than model quality.
"""

import numpy as np
import pytest
from PIL import Image

from twinvoice_tpu.config import FusionConfig
from twinvoice_tpu.data.synthetic import render_invoice
from twinvoice_tpu.fusion.classify import classify_invoice
from twinvoice_tpu.fusion.extract import InvoiceExtractor
from twinvoice_tpu.ocr.fake import FakeOcrEngine
from twinvoice_tpu.qr.detect import QrPipeline, opencv_decode
from twinvoice_tpu.store.memory import MemoryStore
from twinvoice_tpu.app import dashboard as D


class BoxSegmenter:
    """'Perfect' segmenter: crops the ground-truth field boxes directly."""

    def __init__(self, boxes):
        self.boxes = boxes

    def segment_pil(self, pil_img):
        crops = {}
        for field, (x1, y1, x2, y2) in self.boxes.items():
            crops[field] = pil_img.crop((x1 - 4, y1 - 4, x2 + 4, y2 + 4))
        return {}, crops


def test_invoice_to_dashboard():
    items_gt = [
        {"name": "紅茶拿鐵", "qty": 2, "price": 60},
        {"name": "火腿吐司", "qty": 1, "price": 45},
    ]
    img, boxes = render_invoice("AB12345678", "2025-09-09", 165, items=items_gt)

    extractor = InvoiceExtractor(
        BoxSegmenter(boxes),
        QrPipeline(decoders=[opencv_decode]),
        engines=[FakeOcrEngine(lambda im, mode: "165" if mode == "amount" else "")],
        cfg=FusionConfig(auto_rotate=False),
    )
    meta, items, qr_raw = extractor.extract(img)

    # QR carried the header fields
    assert meta["invoice_no"] == "AB12345678"
    assert meta["source"] == "QR"
    assert meta["date"] == "2025-09-09"
    # amount from the OCR path
    assert meta["total_amount"] == "165"
    # items parsed from the TEXT QR and reconciled to the OCR total
    assert [i["name"] for i in items] == ["紅茶拿鐵", "火腿吐司"]
    assert sum(i["amount"] for i in items) == 165

    # classification → persistence → dashboard
    meta["category"] = classify_invoice(meta, items)
    assert meta["category"] == "餐飲"  # 茶 keyword

    store = MemoryStore()
    inv_id = store.save_invoice(meta, items)
    assert inv_id == 1
    df, df_items = D.prepare_frames(store.list_invoices(), store.list_items())
    assert D.years(df) == ["2025"]
    df25, total = D.year_summary(df, "2025")
    assert total == 165
    cats = dict(zip(*(D.category_totals(df25)[c] for c in ("category", "total_amount"))))
    assert cats == {"餐飲": 165}


def test_rotated_invoice_autorotates_and_reads():
    items_gt = [{"name": "路邊停車費", "qty": 1, "price": 60},
                {"name": "車站停車費", "qty": 1, "price": 39}]
    img, boxes = render_invoice("XY87654321", "2024-12-31", 99, items=items_gt)
    rotated = img.rotate(-90, expand=True)  # landscape, QR on the left

    extractor = InvoiceExtractor(
        # stub segmenter: no crops (QR carries everything we assert on)
        type("S", (), {"segment_pil": lambda self, im: ({}, {})})(),
        QrPipeline(decoders=[opencv_decode]),
        engines=[],
        cfg=FusionConfig(auto_rotate=True),
    )
    meta, items, _ = extractor.extract(rotated)
    assert meta["invoice_no"] == "XY87654321"
    assert meta["date"] == "2024-12-31"
    assert [i["name"] for i in items] == ["路邊停車費", "車站停車費"]
