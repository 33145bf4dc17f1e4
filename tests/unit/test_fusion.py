"""Fusion-layer tests: items math, amount decision, classifier, and the full
extractor with fake engines (reference app_camera.py:182-225, 231-256,
707-734, 736-878)."""

import numpy as np
import pytest
from PIL import Image

from twinvoice_tpu.config import FusionConfig, replace
from twinvoice_tpu.fusion.amount import extract_amount
from twinvoice_tpu.fusion.classify import classify_invoice
from twinvoice_tpu.fusion.extract import (
    InvoiceExtractor,
    auto_rotate_by_qr,
    clean_date_candidate,
    clean_invoice_candidate,
)
from twinvoice_tpu.fusion.items import adjust_items_to_total, pick_crop, sum_items_amount
from twinvoice_tpu.ocr.fake import FakeOcrEngine


# ---------------------------------------------------------------------------
# items
# ---------------------------------------------------------------------------


def test_sum_items():
    assert sum_items_amount([{"price": 10, "qty": 2}, {"price": 5}]) == 25
    assert sum_items_amount([{"price": "x", "qty": 2}]) == 0


def test_adjust_items_scales_and_fixes_residue():
    items = [
        {"name": "a", "qty": 1, "price": 22, "amount": 22},
        {"name": "b", "qty": 1, "price": 22, "amount": 22},
    ]
    out = adjust_items_to_total(items, 46)  # the reference's 44-vs-46 case
    assert [i["amount"] for i in out] == [23, 23]
    assert sum(i["amount"] for i in out) == 46
    # original list untouched (functional, unlike the reference)
    assert items[0]["amount"] == 22


def test_adjust_items_rounding_residue_to_last():
    items = [{"qty": 1, "amount": 10}, {"qty": 1, "amount": 10}, {"qty": 1, "amount": 10}]
    out = adjust_items_to_total(items, 100)
    assert sum(i["amount"] for i in out) == 100
    assert out[0]["amount"] == 33 and out[-1]["amount"] == 34


def test_adjust_items_noop_cases():
    assert adjust_items_to_total([], 100) == []
    items = [{"qty": 1, "amount": 0}]
    assert adjust_items_to_total(items, 100) == items  # zero original total
    assert adjust_items_to_total(items, 0) == items


def test_pick_crop():
    crops = {"a": None, "b": "B", "c": "C"}
    assert pick_crop(crops, ["a", "b", "c"]) == "B"
    assert pick_crop(crops, ["a"]) is None


# ---------------------------------------------------------------------------
# amount + candidates
# ---------------------------------------------------------------------------


def test_extract_amount_priority_and_cleaning():
    assert extract_amount("NT$ 1,250", "999") == "1250"
    assert extract_amount(None, "3 5 0") == "350"
    assert extract_amount("no digits", None) == "0"
    assert extract_amount() == "0"


def test_clean_invoice_candidate():
    assert clean_invoice_candidate("ab-1234 5678") == "AB12345678"
    assert clean_invoice_candidate("noAB12345678yes") == "AB12345678"
    assert clean_invoice_candidate("garbage") is None


def test_clean_date_candidate():
    assert clean_date_candidate("2025/09-9") == "2025-09-09"
    assert clean_date_candidate("x2024-12-31x") == "2024-12-31"
    assert clean_date_candidate("31/12/2024") is None  # wrong order rejected


# ---------------------------------------------------------------------------
# classifier
# ---------------------------------------------------------------------------


def test_classifier_by_item_name():
    assert classify_invoice({}, [{"name": "美式咖啡"}]) == "餐飲"
    assert classify_invoice({}, [{"name": "停車費"}]) == "交通"
    assert classify_invoice({}, [{"name": "蝦皮訂單"}]) == "購物"
    assert classify_invoice({}, [{"name": "藥局採購"}]) == "生活"
    assert classify_invoice({}, [{"name": "神秘物品"}]) == "未分類"
    assert classify_invoice({}, []) == "未分類"


# ---------------------------------------------------------------------------
# extractor end-to-end with fakes
# ---------------------------------------------------------------------------


class StubSegmenter:
    """Produces fixed crops (tiny PIL images) for all three fields."""

    def __init__(self, fields=("invoice_no", "date", "total_amount")):
        img = Image.fromarray(np.full((8, 8, 3), 200, np.uint8))
        self.crops = {f: img for f in fields}
        self.calls = 0

    def segment_pil(self, pil_img):
        self.calls += 1
        masks = {f: np.zeros((16, 16), bool) for f in self.crops}
        return masks, dict(self.crops)


class StubQr:
    def __init__(self, payloads):
        self.payloads = payloads

    def scan(self, image):
        return list(self.payloads)


CFG = FusionConfig(auto_rotate=False)


def _img(seed=0, size=(64, 48)):
    rng = np.random.default_rng(seed)
    return Image.fromarray(rng.integers(0, 255, (size[1], size[0], 3), dtype=np.uint8))


def test_extractor_qr_wins():
    qr = StubQr(["AB123456781140909" + "x" * 10, "**奶茶:2:30"])
    ex = InvoiceExtractor(StubSegmenter(), qr, [FakeOcrEngine("60")], cfg=CFG)
    meta, items, raw = ex.extract(_img())
    assert meta["invoice_no"] == "AB12345678"
    assert meta["source"] == "QR"
    assert meta["date"] == "2025-09-09"
    assert meta["date_source"] == "QR"
    assert meta["total_amount"] == "60"
    assert meta["amount_source"] == "merged_ocr"
    assert items == [{"name": "奶茶", "qty": 2, "price": 30, "amount": 60}]


def test_extractor_ocr_fallback_priority():
    # No QR. Engine0 (higher priority) garbles invoice but has a date;
    # engine1 has a clean invoice number.
    e0 = FakeOcrEngine(lambda img, mode: "2025-03-05" if mode != "amount" else "100")
    # e0 returns "2025-03-05" for both text fields → invoice regex fails, date hits
    e1 = FakeOcrEngine(lambda img, mode: "ab12345678" if mode != "amount" else "999")
    ex = InvoiceExtractor(StubSegmenter(), StubQr([]), [e0, e1], cfg=CFG)
    meta, items, _ = ex.extract(_img(1))
    assert meta["invoice_no"] == "AB12345678"
    assert meta["source"] == "merged_ocr"
    assert meta["date"] == "2025-03-05"
    assert meta["total_amount"] == "100"  # engine0 outranks engine1
    assert items == []


def test_extractor_amount_always_runs_even_with_full_qr():
    qr = StubQr(["AB123456781140909tailtailtail"])
    ex = InvoiceExtractor(StubSegmenter(), qr, [FakeOcrEngine("777")], cfg=CFG)
    meta, _, _ = ex.extract(_img(2))
    assert meta["total_amount"] == "777"


def test_extractor_cache_hits_by_content():
    seg = StubSegmenter()
    ex = InvoiceExtractor(seg, StubQr([]), [FakeOcrEngine("1")], cfg=CFG)
    img = _img(3)
    ex.extract(img)
    ex.extract(img)
    assert seg.calls == 1  # second call served from cache
    ex.clear_cache()
    ex.extract(img)
    assert seg.calls == 2


def test_extractor_items_reconciled_to_total():
    qr = StubQr(["AB123456781140909xxxxxxxxxx", "**紅茶:1:22:鬆餅:1:22"])
    ex = InvoiceExtractor(
        StubSegmenter(), qr, [FakeOcrEngine("46")],
        cfg=replace(CFG, adjust_items_to_total=True),
    )
    meta, items, _ = ex.extract(_img(4))
    assert meta["total_amount"] == "46"
    assert [i["amount"] for i in items] == [23, 23]


def test_extractor_none_crops_skip_engines():
    class NoCropSegmenter(StubSegmenter):
        def segment_pil(self, pil_img):
            self.calls += 1
            return {}, {"invoice_no": None, "date": None, "total_amount": None}

    eng = FakeOcrEngine("XX11223344")
    ex = InvoiceExtractor(NoCropSegmenter(), StubQr([]), [eng], cfg=CFG)
    meta, _, _ = ex.extract(_img(5))
    assert eng.calls == []  # engine never invoked on None crops
    assert meta["invoice_no"] is None
    assert meta["total_amount"] == "0"


# ---------------------------------------------------------------------------
# auto-rotate
# ---------------------------------------------------------------------------


def test_auto_rotate_left_qr_rotates_ccw():
    img = _img(6, size=(100, 50))  # landscape
    out = auto_rotate_by_qr(img, qr_regions_fn=lambda im: [(5, 10, 25, 30)])
    assert out.size == (50, 100)


def test_auto_rotate_right_qr_rotates_cw():
    img = _img(7, size=(100, 50))
    out = auto_rotate_by_qr(img, qr_regions_fn=lambda im: [(80, 10, 95, 30)])
    assert out.size == (50, 100)


def test_auto_rotate_center_or_portrait_untouched():
    img = _img(8, size=(100, 50))
    assert auto_rotate_by_qr(img, qr_regions_fn=lambda im: [(45, 10, 55, 30)]).size == (100, 50)
    portrait = _img(9, size=(50, 100))
    assert auto_rotate_by_qr(portrait, qr_regions_fn=lambda im: [(0, 0, 10, 10)]).size == (50, 100)


def test_auto_rotate_no_qr_untouched():
    img = _img(10, size=(100, 50))
    assert auto_rotate_by_qr(img, qr_regions_fn=lambda im: []).size == (100, 50)
