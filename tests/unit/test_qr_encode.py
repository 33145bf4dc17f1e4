"""QR encoder tests: RS known vectors, capacity/version pick, and decode
round-trips through the independent OpenCV decoder."""

import numpy as np
import pytest

from twinvoice_tpu.qr.encode import (
    encode_qr_matrix,
    pick_version,
    render_qr,
    rs_encode,
)
from twinvoice_tpu.qr.detect import QrPipeline, opencv_decode


def test_rs_known_vector():
    # the classic v1-M example block
    data = [0x10, 0x20, 0x0C, 0x56, 0x61, 0x80, 0xEC, 0x11,
            0xEC, 0x11, 0xEC, 0x11, 0xEC, 0x11, 0xEC, 0x11]
    assert rs_encode(data, 10) == [0xA5, 0x24, 0xD4, 0xC1, 0xED, 0x36, 0xC7, 0x87, 0x2C, 0x55]


def test_pick_version():
    assert pick_version(5, "M") == 1     # v1-M holds 16 bytes
    assert pick_version(15, "M") == 2
    assert pick_version(200, "M") == 10
    assert pick_version(1000, "M") == 26   # v11-40 now supported
    assert pick_version(2300, "M") == 40
    with pytest.raises(ValueError):
        pick_version(3000, "M")            # beyond v40-M capacity


def test_matrix_structure():
    m = encode_qr_matrix("short", version=1)
    assert m.shape == (21, 21)
    assert m[0, 0] and m[3, 3] and not m[1, 1]     # finder ring/core
    assert m[21 - 8, 8]                            # dark module
    m7 = encode_qr_matrix("x" * 100, level="L", version=7)
    assert m7.shape == (45, 45)


@pytest.mark.parametrize(
    "payload,level,mask",
    [
        ("HELLO WORLD 1234567890", "M", 0),
        ("AB123456781140909" + "X" * 40, "L", 3),
        ("**珍珠奶茶:2:60:雞排:1:85:" + "Y" * 80, "M", 5),
        ("Z" * 200, "M", 2),
        ("short", "H", 7),
    ],
)
def test_roundtrip_via_opencv(payload, level, mask):
    img = render_qr(payload, module_px=6, level=level, mask=mask)
    rgb = np.stack([img] * 3, axis=-1)
    assert payload in opencv_decode(rgb)


def test_pipeline_scans_rendered_invoice():
    from twinvoice_tpu.data.synthetic import header_qr_payload, render_invoice

    img, _ = render_invoice("AB12345678", "2025-09-09", 120,
                            items=[{"name": "紅茶拿鐵", "qty": 2, "price": 60},
                                   {"name": "火腿吐司", "qty": 1, "price": 45}])
    payloads = QrPipeline(decoders=[opencv_decode]).scan(img)
    assert any("AB12345678" in p for p in payloads)
    assert any(p.startswith("**") for p in payloads)


def test_pipeline_keeps_short_item_qr():
    """A TW item ('**') QR is often < min_len chars; the reference's meta
    classifier accepts any '**' string (app_camera.py:118), so scan must
    keep it — dropping it loses the item list AND defeats the 2-payload
    early stop."""
    from twinvoice_tpu.data.synthetic import render_invoice

    img, _ = render_invoice(
        "AB12345678", "2024-01-02", 123,
        items=[{"name": "茶", "qty": 1, "price": 123}], size=(460, 660),
        seed=42)
    payloads = QrPipeline().scan(img)
    short_item = [p for p in payloads if p.startswith("**")]
    assert short_item and len(short_item[0]) < 20
    assert len(payloads) == 2


def test_detect_downscales_large_frames():
    """Frames over _DETECT_MAX_DIM detect on a downscale; boxes must come
    back in full-resolution coordinates and still cover both QRs."""
    from PIL import Image

    from twinvoice_tpu.data.synthetic import render_invoice
    from twinvoice_tpu.qr.detect import detect_qr_regions

    img, _ = render_invoice("AB12345678", "2024-01-02", 123,
                            items=[{"name": "茶", "qty": 1, "price": 123}],
                            size=(500, 700), seed=43)
    canvas = Image.new("RGB", (1000, 1400), (255, 255, 255))
    canvas.paste(img.resize((1000, 1400)), (0, 0))
    rgb = np.asarray(canvas)
    boxes = detect_qr_regions(rgb)
    assert len(boxes) >= 2
    # decode from the full-res crops located by the downscaled pass
    qr = QrPipeline()
    texts = []
    for (x1, y1, x2, y2) in boxes:
        texts += qr._decode_all(rgb[y1:y2, x1:x2])
    assert any("AB12345678" in t for t in texts)


def test_scan_fast_pass_single_decode_on_clean_frame():
    """Bulk-path economics (1-core host): a clean ≥420 px invoice must
    early-stop after the 0.75× gray fast pass — exactly ONE decoder
    invocation — and still read both QR roles. A tracking decoder wraps
    the native one to count calls."""
    from twinvoice_tpu.data.synthetic import render_invoice
    from twinvoice_tpu.qr.detect import QrPipeline, native_decode

    img, _ = render_invoice(
        "AB12345678", "2024-01-02", 123,
        items=[{"name": "茶", "qty": 1, "price": 123}], size=(460, 660),
        seed=44)
    calls = []

    def counting(arr):
        calls.append(arr.shape)
        return native_decode(arr)

    payloads = QrPipeline(decoders=[counting]).scan(img)
    assert len(payloads) == 2
    assert any(p.startswith("AB12345678") for p in payloads)
    assert len(calls) == 1, calls          # fast pass alone sufficed
    assert len(calls[0]) == 2              # and it saw the 2-D gray frame
    assert max(calls[0]) < 660             # ... downscaled
