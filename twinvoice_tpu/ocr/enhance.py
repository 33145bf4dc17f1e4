"""Crop enhancement ahead of OCR.

Reference recipe being matched (app_camera.py:572-598): 4× cubic upscale →
3×3 sharpen → CLAHE(4.0, 8×8); then Otsu binarization for *text* fields
(invoice number / date — thin strokes) but **never** for the *amount* field
(thick strokes, binarization destroys them).
"""

from __future__ import annotations

import numpy as np

_SHARPEN = np.array([[-1, -1, -1], [-1, 9, -1], [-1, -1, -1]], np.float32)


def _to_rgb_array(image) -> np.ndarray:
    if hasattr(image, "convert"):
        return np.asarray(image.convert("RGB"))
    return np.asarray(image)


def enhance_for_ocr(image, mode: str = "text", upscale: int = 4) -> np.ndarray:
    """Returns a uint8 grayscale array ready for an OCR engine."""
    import cv2

    rgb = _to_rgb_array(image)
    gray = cv2.cvtColor(rgb, cv2.COLOR_RGB2GRAY)
    gray = cv2.resize(gray, None, fx=upscale, fy=upscale, interpolation=cv2.INTER_CUBIC)
    gray = cv2.filter2D(gray, -1, _SHARPEN)
    clahe = cv2.createCLAHE(clipLimit=4.0, tileGridSize=(8, 8))
    gray = clahe.apply(gray)
    if mode != "amount":  # text-like modes (text/invoice/date) get Otsu
        _, gray = cv2.threshold(gray, 0, 255, cv2.THRESH_OTSU)
    return gray


def grayscale_for_ocr(image) -> np.ndarray:
    """Plain grayscale prep (the reference's EasyOCR prep, app_camera.py:817-822)."""
    import cv2

    return cv2.cvtColor(_to_rgb_array(image), cv2.COLOR_RGB2GRAY)


def enhance_camera(image) -> np.ndarray:
    """Camera-frame enhancement that doesn't damage QR codes: CLAHE on the
    luma channel only (YCrCb), leaving chroma and high-frequency detail
    intact. Revives the reference's dead-but-intended camera enhancer
    (app_camera.py:881-911). Returns RGB uint8.
    """
    import cv2

    rgb = _to_rgb_array(image)
    ycrcb = cv2.cvtColor(rgb, cv2.COLOR_RGB2YCrCb)
    y, cr, cb = cv2.split(ycrcb)
    clahe = cv2.createCLAHE(clipLimit=2.0, tileGridSize=(8, 8))
    y = clahe.apply(y)
    return cv2.cvtColor(cv2.merge([y, cr, cb]), cv2.COLOR_YCrCb2RGB)
