"""Fuzzing: the parsers/fusion helpers must never raise on garbage input
(the reference relies on blanket excepts; here the functions themselves are
total)."""

import numpy as np

from twinvoice_tpu.fusion.amount import extract_amount
from twinvoice_tpu.fusion.classify import classify_invoice
from twinvoice_tpu.fusion.extract import clean_date_candidate, clean_invoice_candidate
from twinvoice_tpu.fusion.items import adjust_items_to_total, sum_items_amount
from twinvoice_tpu.qr.parse import (
    is_text_qr_payload,
    parse_header_qr,
    parse_items_qr,
    roc_date_to_iso,
)


def _garbage_strings(rng, n=200):
    out = []
    for _ in range(n):
        k = int(rng.integers(0, 60))
        cps = rng.integers(1, 0x2FFF, k)
        out.append("".join(chr(int(c)) for c in cps))
    out += ["", ":", "::::", "**", "\x00\x01", "A" * 1000, "台:1:2:" * 50,
            "AB1234567", "99999999999999999999", None, b"\xff\xfe bytes"]
    return out


def test_qr_parsers_total(rng):
    garbage = _garbage_strings(rng)
    for s in garbage:
        parse_header_qr([s])
        parse_items_qr([s])
        if isinstance(s, str):
            is_text_qr_payload(s)
            roc_date_to_iso(s[:7])
    parse_header_qr(garbage)
    items = parse_items_qr(garbage)
    assert isinstance(items, list)


def test_fusion_helpers_total(rng):
    garbage = [g for g in _garbage_strings(rng, 100) if isinstance(g, str)]
    for s in garbage:
        extract_amount(s, s[::-1])
        clean_invoice_candidate(s)
        clean_date_candidate(s)
    assert extract_amount(*garbage[:5]) is not None


def test_items_math_total(rng):
    weird_items = [
        {}, {"qty": "x"}, {"price": None, "qty": None},
        {"name": "n", "qty": -1, "price": 5},
        {"amount": 10**12, "qty": 3},
    ]
    sum_items_amount(weird_items)
    adjust_items_to_total(weird_items, 100)
    adjust_items_to_total(weird_items, -5)
    classify_invoice({"invoice_no": None}, [{"name": None}, {}])
