"""Bulk-extraction throughput: full system (QR + U-Net + jaxocr + fusion).

Measures InvoiceExtractor.extract_batch warm on synthetic invoices with
real embedded QRs — the ref's whole pipeline (app_camera.py:736-878) at
bulk. r2 measured 5.5 inv/s with ~80% serial host work (QR scan + PIL
resizes); r3 overlaps the QR scans with the device call and early-stops
the QR scan at 2 payloads.

Usage: python scripts/bench_bulk_extract.py [n_invoices] [--no-qr]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(n=32, use_qr=True):
    from twinvoice_tpu.config import FusionConfig
    from twinvoice_tpu.data.synthetic import render_invoice
    from twinvoice_tpu.fusion.extract import InvoiceExtractor
    from twinvoice_tpu.models import pretrained
    from twinvoice_tpu.ocr.jaxocr.engine import JaxOcrEngine
    from twinvoice_tpu.qr.detect import QrPipeline

    rng = np.random.default_rng(7)
    letters = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
    cases = []
    for i in range(n):
        inv_no = "".join(rng.choice(list(letters), 2)) + "".join(
            rng.choice(list("0123456789"), 8)
        )
        date = (f"{rng.integers(2019, 2031)}-{rng.integers(1, 13):02d}-"
                f"{rng.integers(1, 29):02d}")
        amount = int(rng.integers(1, 99999))
        img, _ = render_invoice(
            inv_no, date, amount,
            items=[{"name": "測試品項", "qty": 1, "price": amount}],
            size=(int(rng.integers(380, 540)), int(rng.integers(580, 740))),
            seed=90_000 + i,
        )
        cases.append((img, inv_no, date, str(amount)))

    seg = pretrained.load_pretrained_segmenter()
    ex = InvoiceExtractor(
        seg, QrPipeline() if use_qr else None, [JaxOcrEngine()],
        FusionConfig(auto_rotate=False, use_qr=use_qr),
    )
    imgs = [c[0] for c in cases]

    results = ex.extract_batch(imgs)  # warm: compiles + caches
    ex.clear_cache()
    from twinvoice_tpu.utils.tracing import get_timer
    get_timer().reset()
    t0 = time.perf_counter()
    results = ex.extract_batch(imgs)
    dt = time.perf_counter() - t0
    print(get_timer().report())

    hits = {"invoice_no": 0, "date": 0, "amount": 0}
    for (meta, _, _), (_, inv_no, date, amount) in zip(results, cases):
        hits["invoice_no"] += meta["invoice_no"] == inv_no
        hits["date"] += meta["date"] == date
        hits["amount"] += meta["total_amount"] == amount
    print(f"bulk extract: {n} invoices in {dt:.2f}s = {n/dt:.1f} inv/s "
          f"(qr={'on' if use_qr else 'off'})")
    print(f"accuracy: { {k: f'{v}/{n}' for k, v in hits.items()} }")


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 32
    main(n, use_qr="--no-qr" not in sys.argv)
