"""OcrEngine protocol — the seam between the fusion pipeline and any OCR
implementation (SURVEY.md §7 step 5).

The reference couples its pipeline directly to two concrete engines (a cloud
HTTP call, app_camera.py:551-570, and a module-global EasyOCR reader,
app_camera.py:73). Here every engine satisfies one protocol so the fusion
code, tests (fakes) and future engines (the JAX CTC recognizer) are
interchangeable, and engines declare whether they want binarized input
("text" fields) or not ("amount" fields) via the ``mode`` argument.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Protocol, runtime_checkable


@dataclass
class OcrResult:
    text: str
    engine: str
    confidence: Optional[float] = None

    def __bool__(self):
        return bool(self.text)


@runtime_checkable
class OcrEngine(Protocol):
    """An OCR engine reads one crop and returns text ('' on failure)."""

    name: str

    def read(self, image, mode: str = "text") -> OcrResult:
        """``image``: PIL.Image or RGB ndarray; ``mode``: "text" | "amount"."""
        ...


class NullOcrEngine:
    """Always-empty engine (used when an optional backend is unavailable)."""

    name = "null"

    def read(self, image, mode: str = "text") -> OcrResult:
        return OcrResult("", self.name)
