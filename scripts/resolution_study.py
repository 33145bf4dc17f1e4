"""Serving-grid resolution study (round-2 plan item, runnable now).

The U-Net is fully convolutional, so the serving grid is a config knob. For
each grid size this measures (a) full-system field accuracy on held-out
synthetic invoices (bundled segmenter + jaxocr, QR disabled so OCR carries
everything) and (b) segmentation throughput at batch 128. Accuracy on real
photos must be re-checked before changing the production default.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(resolutions=(512, 384, 320, 256), n_eval=20):
    import jax
    import jax.numpy as jnp

    from twinvoice_tpu.config import FusionConfig, InferConfig
    from twinvoice_tpu.data.synthetic import render_invoice
    from twinvoice_tpu.fusion.extract import InvoiceExtractor
    from twinvoice_tpu.models import pretrained
    from twinvoice_tpu.ocr.jaxocr.engine import JaxOcrEngine

    engine = JaxOcrEngine()
    rng = np.random.default_rng(20260816)
    cases = []
    for i in range(n_eval):
        letters = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
        inv_no = "".join(rng.choice(list(letters), 2)) + "".join(
            rng.choice(list("0123456789"), 8)
        )
        date = f"{rng.integers(2019, 2031)}-{rng.integers(1, 13):02d}-{rng.integers(1, 29):02d}"
        amount = int(rng.integers(1, 99999))
        img, _ = render_invoice(
            inv_no, date, amount,
            items=[{"name": "測試品項", "qty": 1, "price": amount}],
            size=(int(rng.integers(380, 540)), int(rng.integers(580, 740))),
            seed=70_000 + i,
        )
        cases.append((img, inv_no, date, str(amount)))

    for res in resolutions:
        seg = pretrained.load_pretrained_segmenter(infer_cfg=InferConfig(img_size=res))
        ex = InvoiceExtractor(seg, None, [engine], FusionConfig(auto_rotate=False, use_qr=False))
        results = ex.extract_batch([c[0] for c in cases])
        hits = {"invoice_no": 0, "date": 0, "amount": 0}
        for (meta, _, _), (_, inv_no, date, amount) in zip(results, cases):
            hits["invoice_no"] += meta["invoice_no"] == inv_no
            hits["date"] += meta["date"] == date
            hits["amount"] += meta["total_amount"] == amount

        # segmentation throughput at this grid, batch 128
        b = 128
        imgs_u8 = jnp.asarray(
            np.random.default_rng(0).integers(0, 255, (b, res, res, 3), dtype=np.uint8)
        )
        sizes = jnp.asarray([[1920, 1080]] * b, jnp.int32)
        for _ in range(2):
            _, boxes, ok = seg.segment_batch(imgs_u8, sizes, return_masks=False)
            np.asarray(boxes)
        t0 = time.perf_counter()
        iters = 6
        for _ in range(iters):
            _, boxes, ok = seg.segment_batch(imgs_u8, sizes, return_masks=False)
            np.asarray(boxes)
        dt = (time.perf_counter() - t0) / iters
        print(json.dumps({
            "grid": res,
            "img_per_s": round(b / dt, 1),
            "invoice_no_acc": hits["invoice_no"] / n_eval,
            "date_acc": hits["date"] / n_eval,
            "amount_acc": hits["amount"] / n_eval,
        }), flush=True)


if __name__ == "__main__":
    main()
