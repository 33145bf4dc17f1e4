"""Synthetic Taiwanese e-invoice renderer — test/eval fixture generator.

Renders a receipt-like image with the three text fields at known positions
and the two real QR codes (header + TEXT items, via our own encoder), plus
the labelme-style ground-truth shapes. Used by the e2e tests (SURVEY.md §4.5)
and the OCR eval config (BASELINE config 4).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np


def iso_to_roc(date_iso: str) -> str:
    """``2025-09-09`` → ``1140909`` (ROC calendar)."""
    y, m, d = date_iso.split("-")
    return f"{int(y) - 1911}{int(m):02d}{int(d):02d}"


def header_qr_payload(invoice_no: str, date_iso: str, amount: int = 0) -> str:
    """Realistic header-QR payload: number + ROC date + random-looking tail."""
    return f"{invoice_no}{iso_to_roc(date_iso)}1234:{amount:08x}:0:0:0:AAAA/BBBBCCCC=="


def items_qr_payload(items: List[dict]) -> str:
    body = ":".join(f"{it['name']}:{it['qty']}:{it['price']}" for it in items)
    return "**" + body


def render_invoice(
    invoice_no: str = "AB12345678",
    date_iso: str = "2025-09-09",
    amount: int = 120,
    items: Optional[List[dict]] = None,
    size: Tuple[int, int] = (440, 640),
    seed: int = 0,
):
    """Returns (PIL.Image RGB, field→(x1,y1,x2,y2) ground-truth boxes)."""
    from PIL import Image, ImageDraw

    from twinvoice_tpu.qr.encode import render_qr

    if items is None:
        items = [{"name": "синt", "qty": 1, "price": amount}]
    from PIL import ImageFont

    w, h = size
    rng = np.random.default_rng(seed)
    bg = np.full((h, w, 3), 245, np.uint8)
    bg += rng.integers(0, 8, bg.shape, dtype=np.uint8)  # paper noise
    img = Image.fromarray(bg)
    draw = ImageDraw.Draw(img)

    boxes: Dict[str, Tuple[int, int, int, int]] = {}
    font = ImageFont.truetype(
        "/usr/share/fonts/truetype/dejavu/DejaVuSansMono.ttf", 22
    )

    def value_line(label_text, value_text, y):
        """CJK label in the small default font (cosmetic), latin/digit VALUE
        in a print-quality font — the ground-truth box covers the value."""
        draw.text((30, y + 6), label_text, fill=(20, 20, 20))
        x = 120
        draw.text((x, y), value_text, fill=(20, 20, 20), font=font)
        tw = draw.textlength(value_text, font=font)
        return (x, y, int(x + tw), y + 26)

    draw.text((150, 20), "電子發票證明聯", fill=(10, 10, 10))
    boxes["invoice_no"] = value_line("發票號碼", f"{invoice_no[:2]}-{invoice_no[2:]}", 55)
    boxes["date"] = value_line("日期", date_iso, 95)
    boxes["total_amount"] = value_line("總計", str(amount), 135)

    qr1 = render_qr(header_qr_payload(invoice_no, date_iso, amount), module_px=4)
    qr2 = render_qr(items_qr_payload(items), module_px=4)
    q1 = Image.fromarray(qr1).convert("RGB")
    q2 = Image.fromarray(qr2).convert("RGB")
    img.paste(q1, (20, h - q1.size[1] - 20))
    img.paste(q2, (w - q2.size[0] - 20, h - q2.size[1] - 20))

    return img, boxes


def labelme_shapes(boxes: Dict[str, Tuple[int, int, int, int]]) -> List[dict]:
    """Ground-truth boxes → labelme polygon shapes (for the data builder)."""
    shapes = []
    for label, (x1, y1, x2, y2) in boxes.items():
        shapes.append(
            {"label": label, "points": [[x1, y1], [x2, y1], [x2, y2], [x1, y2]]}
        )
    return shapes
