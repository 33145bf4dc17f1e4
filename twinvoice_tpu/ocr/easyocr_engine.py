"""EasyOCR-backed local engine (reference app_camera.py:73, 817-833), gated:
easyocr is not part of this image, so construction degrades to unavailable
and the fusion pipeline falls through to the next engine. The long-term
local engine is the JAX CTC recognizer in :mod:`twinvoice_tpu.ocr.jaxocr`.
"""

from __future__ import annotations

from twinvoice_tpu.ocr.base import OcrResult
from twinvoice_tpu.ocr.enhance import grayscale_for_ocr


class EasyOcrEngine:
    name = "easyocr"

    def __init__(self, languages=("ch_tra", "en"), reader=None):
        """``reader``: inject any object with EasyOCR's
        ``readtext(img, detail=0) -> list[str]`` surface (tests use a fake;
        deployments may pass a pre-warmed Reader to skip the model load)."""
        self._reader = reader
        if self._reader is None:
            try:
                import easyocr  # pragma: no cover - not installed in this image

                self._reader = easyocr.Reader(list(languages), gpu=False)
            except Exception:
                self._reader = None

    def available(self) -> bool:
        return self._reader is not None

    def read(self, image, mode: str = "text") -> OcrResult:
        if self._reader is None:
            return OcrResult("", self.name)
        try:
            gray = grayscale_for_ocr(image)
            words = self._reader.readtext(gray, detail=0)
            return OcrResult(" ".join(words), self.name)
        except Exception:
            return OcrResult("", self.name)
