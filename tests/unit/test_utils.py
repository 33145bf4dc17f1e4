"""Tracing + failure-log utilities."""

import pytest

from twinvoice_tpu.utils.errors import FailureLog, OcrEngineError, QrDecodeError
from twinvoice_tpu.utils.tracing import StageTimer, trace_span


def test_stage_timer_stats():
    t = StageTimer()
    for ms in (1, 2, 3):
        t.record("seg", ms / 1000)
    st = t.stats()["seg"]
    assert st["count"] == 3
    assert st["p50_ms"] == pytest.approx(2.0, abs=0.2)
    assert "seg" in t.report()
    t.reset()
    assert t.stats() == {}


def test_trace_span_records():
    t = StageTimer()
    with trace_span("qr", timer=t):
        pass
    assert t.stats()["qr"]["count"] == 1


def test_trace_span_records_on_exception():
    t = StageTimer()
    with pytest.raises(ValueError):
        with trace_span("boom", timer=t):
            raise ValueError("x")
    assert t.stats()["boom"]["count"] == 1


def test_failure_log_guarded():
    log = FailureLog()
    assert log.guarded("qr", lambda: 42) == 42
    assert log.guarded("qr", lambda: 1 / 0, default="fallback") == "fallback"
    assert log.guarded("ocr", lambda: [][1], default=None) is None
    assert bool(log)
    assert log.stages_failed() == ["ocr", "qr"]
    dicts = log.as_dicts()
    assert dicts[0]["error"] == "ZeroDivisionError"


def test_error_taxonomy_stages():
    assert QrDecodeError.stage == "qr"
    assert OcrEngineError.stage == "ocr"


def test_extractor_records_failures():
    from twinvoice_tpu.config import FusionConfig
    from twinvoice_tpu.fusion.extract import InvoiceExtractor
    import numpy as np
    from PIL import Image

    class ExplodingSegmenter:
        def segment_pil(self, img):
            raise RuntimeError("segfault-of-the-mind")

    class ExplodingQr:
        def scan(self, img):
            raise IOError("no camera")

    ex = InvoiceExtractor(
        ExplodingSegmenter(), ExplodingQr(), engines=[],
        cfg=FusionConfig(auto_rotate=False),
    )
    img = Image.fromarray(np.zeros((10, 10, 3), np.uint8))
    meta, items, qr = ex.extract(img)
    # degraded result, but failures are recorded with stages
    assert meta["invoice_no"] is None and meta["total_amount"] == "0"
    stages = {f["stage"] for f in meta["failures"]}
    assert stages == {"qr", "segment"}
