"""Full-system e2e with the BUNDLED trained segmenter: real U-Net
localization (no ground-truth boxes) → crops → jaxocr recognizer → fusion.
This is the complete recognition stack as shipped.
"""

import numpy as np
import pytest

from twinvoice_tpu.models import pretrained


pytestmark = pytest.mark.skipif(
    not pretrained.available(), reason="bundled segmenter weights missing"
)


def test_full_system_reads_fields_without_qr():
    import jax.numpy as jnp

    from twinvoice_tpu.config import FusionConfig
    from twinvoice_tpu.data.synthetic import render_invoice
    from twinvoice_tpu.fusion.extract import InvoiceExtractor
    from twinvoice_tpu.ocr.jaxocr.engine import JaxOcrEngine

    seg = pretrained.load_pretrained_segmenter(dtype=jnp.float32)
    engine = JaxOcrEngine()
    if not engine.available():
        pytest.skip("jaxocr weights missing")

    extractor = InvoiceExtractor(
        seg, qr_pipeline=None, engines=[engine],
        cfg=FusionConfig(auto_rotate=False, use_qr=False),
    )

    rng = np.random.default_rng(31337)
    hits = 0
    n = 3  # CPU test box; the TPU eval runs 25 (scripts + docs)
    for i in range(n):
        letters = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
        inv_no = "".join(rng.choice(list(letters), 2)) + "".join(
            rng.choice(list("0123456789"), 8)
        )
        date = f"{rng.integers(2019, 2031)}-{rng.integers(1, 13):02d}-{rng.integers(1, 29):02d}"
        amount = int(rng.integers(100, 99999))
        img, _ = render_invoice(
            inv_no, date, amount,
            items=[{"name": "測試品項", "qty": 1, "price": amount}],
            size=(460, 660), seed=500 + i,
        )
        extractor.clear_cache()
        meta, _, _ = extractor.extract(img)
        hits += (
            (meta["invoice_no"] == inv_no)
            + (meta["date"] == date)
            + (meta["total_amount"] == str(amount))
        )
    assert hits >= 3 * n - 1, hits  # allow one miss across all fields
