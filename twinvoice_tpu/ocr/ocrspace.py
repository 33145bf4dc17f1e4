"""OCR.space cloud engine — optional HTTP backend behind the OcrEngine
protocol, never on the hot path (SURVEY.md §2.3).

Reference behavior (app_camera.py:551-570): POST a base64 PNG to
``api.ocr.space/parse/image`` with language=chs, engine 2; empty string on
any failure. Differences: the API key comes from config/env (the reference
hardcodes one at app_camera.py:68), the transport is injectable for tests,
and the per-mode enhancement is applied inside the engine.
"""

from __future__ import annotations

import base64
import io
import os
from typing import Callable, Optional

from twinvoice_tpu.ocr.base import OcrResult
from twinvoice_tpu.ocr.enhance import enhance_for_ocr

API_URL = "https://api.ocr.space/parse/image"
API_KEY_ENV = "OCR_SPACE_API_KEY"


def _default_transport(payload: dict) -> dict:
    import requests

    return requests.post(API_URL, data=payload, timeout=30).json()


class OcrSpaceEngine:
    name = "ocr.space"

    def __init__(
        self,
        api_key: Optional[str] = None,
        transport: Optional[Callable[[dict], dict]] = None,
        language: str = "chs",
        engine: int = 2,
    ):
        self.api_key = api_key or os.environ.get(API_KEY_ENV, "")
        self.transport = transport or _default_transport
        self.language = language
        self.engine = engine

    def available(self) -> bool:
        return bool(self.api_key)

    def read(self, image, mode: str = "text") -> OcrResult:
        if not self.available():
            return OcrResult("", self.name)
        gray = enhance_for_ocr(image, mode=mode)
        from PIL import Image

        buf = io.BytesIO()
        Image.fromarray(gray).save(buf, format="PNG")
        payload = {
            "apikey": self.api_key,
            "language": self.language,
            "isOverlayRequired": False,
            "base64Image": "data:image/png;base64,"
            + base64.b64encode(buf.getvalue()).decode(),
            "OCREngine": self.engine,
        }
        try:
            resp = self.transport(payload)
            text = resp["ParsedResults"][0]["ParsedText"]
            return OcrResult(text or "", self.name)
        except Exception:
            return OcrResult("", self.name)
