"""BASELINE config 4 — end-to-end OCR eval on a held-out synthetic set.

Renders N synthetic invoices (real QR codes + text fields), runs the full
extraction pipeline (native/opencv QR decode + jaxocr recognizer on the
ground-truth crops), and reports field accuracies as one JSON line.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(n=50, use_qr=True):
    from twinvoice_tpu.config import FusionConfig
    from twinvoice_tpu.data.synthetic import render_invoice
    from twinvoice_tpu.fusion.extract import InvoiceExtractor
    from twinvoice_tpu.ocr.jaxocr.engine import JaxOcrEngine
    from twinvoice_tpu.qr.detect import QrPipeline

    engine = JaxOcrEngine()
    if not engine.available():
        print(json.dumps({"error": "jaxocr weights not trained yet"}))
        return

    class GtSegmenter:
        """Uses the renderer's ground-truth boxes (isolates OCR quality)."""

        def __init__(self):
            self.boxes = None

        def segment_pil(self, img):
            return {}, {
                f: img.crop((x1 - 4, y1 - 4, x2 + 4, y2 + 4))
                for f, (x1, y1, x2, y2) in self.boxes.items()
            }

    seg = GtSegmenter()
    extractor = InvoiceExtractor(
        seg,
        QrPipeline() if use_qr else None,
        engines=[engine],
        cfg=FusionConfig(auto_rotate=False, use_qr=use_qr),
    )

    rng = np.random.default_rng(123)
    hits = {"invoice_no": 0, "date": 0, "amount": 0}
    for i in range(n):
        letters = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
        inv_no = "".join(rng.choice(list(letters), 2)) + "".join(
            rng.choice(list("0123456789"), 8)
        )
        date = f"{rng.integers(2019, 2030)}-{rng.integers(1, 13):02d}-{rng.integers(1, 29):02d}"
        amount = int(rng.integers(1, 99999))
        img, boxes = render_invoice(
            inv_no, date, amount,
            items=[{"name": "品項測試甲", "qty": 1, "price": amount}],
            seed=i,
        )
        seg.boxes = boxes
        extractor.clear_cache()
        meta, items, _ = extractor.extract(img)
        hits["invoice_no"] += meta["invoice_no"] == inv_no
        hits["date"] += meta["date"] == date
        hits["amount"] += meta["total_amount"] == str(amount)

    out = {
        "metric": "field accuracy on synthetic held-out invoices"
        + ("" if use_qr else " (OCR-only, QR disabled)"),
        "n": n,
        "invoice_no_acc": hits["invoice_no"] / n,
        "date_acc": hits["date"] / n,
        "amount_acc": hits["amount"] / n,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    main(n=n, use_qr="--no-qr" not in sys.argv)
