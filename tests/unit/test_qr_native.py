"""Native C++ QR decoder tests (native/qrdecode.cpp via twinvoice_tpu.qr.native).

Round-trip oracle is our own encoder (itself validated against OpenCV's
decoder in test_qr_encode.py), so encoder and decoder cannot share a bug
silently.
"""

import numpy as np
import pytest

from twinvoice_tpu.qr import native
from twinvoice_tpu.qr.encode import render_qr

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native qrdecode library not built"
)

PAYLOAD = "AB123456781140909XXYYZZ11223344556677889900"


def _img(**kw):
    return render_qr(PAYLOAD, **kw)


@pytest.mark.parametrize("level,mask,px", [
    ("L", 0, 4), ("M", 3, 5), ("Q", 5, 4), ("H", 7, 6), ("M", 2, 3),
])
def test_roundtrip(level, mask, px):
    assert PAYLOAD in native.decode(_img(module_px=px, level=level, mask=mask))


@pytest.mark.parametrize("k", [1, 2, 3])
def test_rot90(k):
    assert PAYLOAD in native.decode(np.rot90(_img(module_px=5), k))


def test_small_rotation():
    import cv2

    img = _img(module_px=5)
    h, w = img.shape
    M = cv2.getRotationMatrix2D((w / 2, h / 2), 12, 1.0)
    rot = cv2.warpAffine(img, M, (w + 60, h + 60), borderValue=255)
    assert PAYLOAD in native.decode(rot)


def test_noise():
    rng = np.random.default_rng(0)
    img = _img(module_px=5).astype(int)
    noisy = np.clip(img + rng.normal(0, 40, img.shape), 0, 255).astype(np.uint8)
    assert PAYLOAD in native.decode(noisy)


def test_error_correction_flipped_modules():
    rng = np.random.default_rng(1)
    img = _img(module_px=5, level="M", mask=3).copy()
    flips = set()
    while len(flips) < 6:
        r, c = rng.integers(9, 20, 2)
        flips.add((int(r), int(c)))
    for r, c in flips:
        y, x = 20 + r * 5, 20 + c * 5
        img[y : y + 5, x : x + 5] = 255 - img[y : y + 5, x : x + 5]
    assert PAYLOAD in native.decode(img)


def test_perspective():
    import cv2

    img = _img(module_px=5)
    h, w = img.shape
    src = np.float32([[0, 0], [w, 0], [0, h], [w, h]])
    dst = np.float32([[10, 5], [w - 3, 8], [4, h - 6], [w - 12, h - 2]])
    warped = cv2.warpPerspective(
        img, cv2.getPerspectiveTransform(src, dst), (w, h), borderValue=255
    )
    assert PAYLOAD in native.decode(warped)


def test_two_qr_invoice():
    from twinvoice_tpu.data.synthetic import render_invoice

    inv, _ = render_invoice(
        "AB12345678", "2025-09-09", 165,
        items=[{"name": "紅茶拿鐵", "qty": 2, "price": 60},
               {"name": "火腿吐司", "qty": 1, "price": 45}],
    )
    got = native.decode(inv)
    assert any("AB12345678" in g for g in got)
    assert any(g.startswith("**") for g in got)


def test_rgb_input_and_blank():
    rgb = np.stack([_img(module_px=5)] * 3, axis=-1)
    assert PAYLOAD in native.decode(rgb)
    assert native.decode(np.full((100, 100), 255, np.uint8)) == []
    assert native.decode(np.zeros((10, 10), np.uint8)) == []  # below min size


def _padded(payload, px=5, margin=50, **kw):
    qr = render_qr(payload, module_px=px, **kw)
    out = np.full((qr.shape[0] + 2 * margin, qr.shape[1] + 2 * margin), 255,
                  np.uint8)
    out[margin:margin + qr.shape[0], margin:margin + qr.shape[1]] = qr
    return out


@pytest.mark.parametrize("angle", [30, 75, 150, 225, 295, 340])
def test_arbitrary_rotation(angle):
    """Full in-plane rotation envelope (VERDICT r1 #6; ZXing handles any
    angle, reference app_camera.py:464)."""
    import cv2

    img = _padded(PAYLOAD)
    h, w = img.shape
    m = cv2.getRotationMatrix2D((w / 2, h / 2), angle, 1.0)
    rot = cv2.warpAffine(img, m, (w, h), borderValue=255)
    assert PAYLOAD in native.decode(rot)


def test_mirrored():
    """Mirrored codes decode via the swapped TR/BL retry (ZXing parity)."""
    img = _padded(PAYLOAD)
    assert PAYLOAD in native.decode(img[:, ::-1].copy())
    assert PAYLOAD in native.decode(img[::-1, :].copy())


@pytest.mark.parametrize("target_version", [11, 14, 25, 40])
def test_high_version_roundtrip(target_version):
    """Versions 11-40: long TEXT-QR payloads exceed v10 capacity
    (VERDICT r1 #6)."""
    from twinvoice_tpu.qr.encode import pick_version

    payload = None
    for ln in range(1, 3000):
        try:
            if pick_version(ln, "M") == target_version:
                payload = "TX" + "A1:" * (ln // 3) + "Z" * (ln % 3)
                payload = payload[:ln]
                break
        except ValueError:
            break
    assert payload is not None
    assert payload in native.decode(_padded(payload, px=4))


def test_high_version_rotated():
    import cv2

    payload = "**" + ":".join(f"item{i}:1:{i}" for i in range(40))
    img = _padded(payload, px=5, margin=60)
    h, w = img.shape
    m = cv2.getRotationMatrix2D((w / 2, h / 2), 37, 1.0)
    rot = cv2.warpAffine(img, m, (w, h), borderValue=255)
    assert payload in native.decode(rot)
