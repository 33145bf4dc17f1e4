"""TW e-invoice QR parser tests (reference behavior app_camera.py:94-161,
421-459)."""

from twinvoice_tpu.qr.parse import (
    coerce_text,
    is_text_qr_payload,
    is_valid_invoice_no,
    parse_header_qr,
    parse_items_qr,
    roc_date_to_iso,
)


HEADER = "AB123456781140909B2C4...random tail 0000"  # AB12345678 + ROC 114/09/09
TEXT_QR = "**珍珠奶茶:2:60:雞排:1:85"


def test_roc_date_conversion():
    assert roc_date_to_iso("1140909") == "2025-09-09"
    assert roc_date_to_iso("1000101") == "2011-01-01"
    assert roc_date_to_iso("0991231") is None  # ROC year < 100 out of window
    assert roc_date_to_iso("1141332") is None  # month 13 invalid
    assert roc_date_to_iso("abc1234") is None


def test_header_parse():
    no, date = parse_header_qr([HEADER])
    assert no == "AB12345678" and date == "2025-09-09"


def test_header_parse_bare_fallback():
    no, date = parse_header_qr(["noise XY87654321 noise"])
    assert no == "XY87654321" and date is None


def test_header_parse_prefers_full_match():
    # bare number in first payload, full header in second: full wins the date
    no, date = parse_header_qr(["QQ00000000", HEADER])
    assert no == "AB12345678" and date == "2025-09-09"


def test_header_parse_bytes_payload():
    no, date = parse_header_qr([HEADER.encode()])
    assert no == "AB12345678"


def test_header_parse_empty():
    assert parse_header_qr([]) == (None, None)


def test_text_qr_detection():
    assert is_text_qr_payload(TEXT_QR)
    assert is_text_qr_payload("**********")
    assert is_text_qr_payload("燒肉飯:1:120")  # CJK + d:d pattern
    assert not is_text_qr_payload(HEADER)


def test_items_parse():
    items = parse_items_qr([TEXT_QR])
    assert items == [
        {"name": "珍珠奶茶", "qty": 2, "price": 60, "amount": 120},
        {"name": "雞排", "qty": 1, "price": 85, "amount": 85},
    ]


def test_items_parse_junk_filtered():
    items = parse_items_qr(["**總計:1:205:隨機:1:4:X:1:5:好物:1:10"])
    # 總計/隨機 are structural; 'X' is single-char junk
    assert [i["name"] for i in items] == ["好物"]


def test_items_parse_fragmented_payloads():
    # items split across two TEXT QR fragments are concatenated
    items = parse_items_qr(["**甲品:1:10", "**乙品:2:20"])
    assert [i["name"] for i in items] == ["甲品", "乙品"]
    assert items[1]["amount"] == 40


def test_items_zero_qty_skipped():
    assert parse_items_qr(["**壞品:0:10:好品:1:10"]) == [
        {"name": "好品", "qty": 1, "price": 10, "amount": 10}
    ]


def test_invoice_no_validation():
    assert is_valid_invoice_no("AB12345678")
    assert not is_valid_invoice_no("AB1234567")     # 7 digits
    assert not is_valid_invoice_no("AB123456789")   # 9 digits
    assert not is_valid_invoice_no("A123456789")    # 1 letter
    assert not is_valid_invoice_no(None)
    assert not is_valid_invoice_no("")


def test_coerce_text():
    assert coerce_text(None) == ""
    assert coerce_text(b"abc\xff") == "abc"
    assert coerce_text(42) == "42"


def test_items_single_char_first_item_kept():
    """Reference parity (app_camera.py:143): the length junk filter runs
    PRE-strip there, so a single-char FIRST item arrives as '**茶' (len 3)
    and survives; a bare 1-char fragment is still junk, and structural
    keywords are rejected even with the marker (stricter than reference)."""
    from twinvoice_tpu.qr.parse import parse_items_qr

    assert parse_items_qr(["**茶:1:123"]) == [
        {"name": "茶", "qty": 1, "price": 123, "amount": 123}
    ]
    assert parse_items_qr(["**茶:1:123:Y:1:2"]) == [
        {"name": "茶", "qty": 1, "price": 123, "amount": 123}
    ]
    assert parse_items_qr(["**總計:1:100"]) == []
