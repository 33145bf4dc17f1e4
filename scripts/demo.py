"""End-to-end demo: synthesize an invoice photo, run the full recognition
pipeline (native C++ QR decode + U-Net crops + jaxocr), classify, persist,
and print the dashboard aggregation — the whole framework in one script.

Usage: python scripts/demo.py [--cpu]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    if "--cpu" in sys.argv:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from twinvoice_tpu.config import FusionConfig
    from twinvoice_tpu.data.synthetic import render_invoice
    from twinvoice_tpu.fusion.classify import classify_invoice
    from twinvoice_tpu.fusion.extract import InvoiceExtractor
    from twinvoice_tpu.ocr.jaxocr.engine import JaxOcrEngine
    from twinvoice_tpu.qr.detect import QrPipeline
    from twinvoice_tpu.store.memory import MemoryStore
    from twinvoice_tpu.app import dashboard as D
    from twinvoice_tpu.utils.tracing import get_timer

    print("rendering a synthetic invoice (real QR codes via qr.encode)...")
    items_gt = [
        {"name": "高鐵自由座", "qty": 1, "price": 700},
        {"name": "便利商店咖啡", "qty": 2, "price": 55},
    ]
    img, boxes = render_invoice("GH24681357", "2026-08-16", 810, items=items_gt)
    img.save("/tmp/demo_invoice.png")
    print("  saved /tmp/demo_invoice.png", img.size)

    from twinvoice_tpu.models import pretrained

    if pretrained.available():
        print("loading the bundled trained segmenter (models/pretrained)...")
        segmenter = pretrained.load_pretrained_segmenter()
    else:  # fall back to ground-truth boxes if weights were stripped
        class GtSegmenter:
            def segment_pil(self, im):
                return {}, {
                    f: im.crop((x1 - 4, y1 - 4, x2 + 4, y2 + 4))
                    for f, (x1, y1, x2, y2) in boxes.items()
                }

        segmenter = GtSegmenter()

    extractor = InvoiceExtractor(
        segmenter, QrPipeline(), [JaxOcrEngine()],
        FusionConfig(auto_rotate=False),
    )
    meta, items, qr_raw = extractor.extract(img)
    meta["category"] = classify_invoice(meta, items)
    print("\nrecognition result:")
    print(json.dumps({k: v for k, v in meta.items() if k != "qr_raw"},
                     ensure_ascii=False, indent=2))
    print("items:", json.dumps(items, ensure_ascii=False))

    store = MemoryStore()
    inv_id = store.save_invoice(meta, items)
    df, df_items = D.prepare_frames(store.list_invoices(), store.list_items())
    year = D.years(df)[0]
    _, total = D.year_summary(df, year)
    print(f"\npersisted as invoice #{inv_id}; dashboard: {year} total NT$ {total}")

    print("\nstage timings:")
    print(get_timer().report())


if __name__ == "__main__":
    main()
