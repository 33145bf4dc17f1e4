"""OCR.space engine against a scripted transport (no network)."""

import numpy as np
import pytest
from PIL import Image

from twinvoice_tpu.ocr.ocrspace import OcrSpaceEngine


IMG = Image.fromarray(np.full((20, 60, 3), 200, np.uint8))


def test_reads_parsed_text():
    seen = {}

    def transport(payload):
        seen.update(payload)
        return {"ParsedResults": [{"ParsedText": "AB12345678"}]}

    eng = OcrSpaceEngine(api_key="k", transport=transport)
    out = eng.read(IMG, mode="text")
    assert out.text == "AB12345678" and out.engine == "ocr.space"
    assert seen["apikey"] == "k"
    assert seen["language"] == "chs" and seen["OCREngine"] == 2
    assert seen["base64Image"].startswith("data:image/png;base64,")


def test_mode_changes_enhancement():
    payloads = []

    def transport(payload):
        payloads.append(payload["base64Image"])
        return {"ParsedResults": [{"ParsedText": "x"}]}

    eng = OcrSpaceEngine(api_key="k", transport=transport)
    eng.read(IMG, mode="text")    # Otsu-binarized
    eng.read(IMG, mode="amount")  # never binarized
    assert payloads[0] != payloads[1]


def test_failures_return_empty():
    eng = OcrSpaceEngine(api_key="k", transport=lambda p: {"bad": "shape"})
    assert eng.read(IMG).text == ""
    boom = OcrSpaceEngine(api_key="k", transport=lambda p: 1 / 0)
    assert boom.read(IMG).text == ""


def test_unavailable_without_key(monkeypatch):
    monkeypatch.delenv("OCR_SPACE_API_KEY", raising=False)
    eng = OcrSpaceEngine()
    assert not eng.available()
    assert eng.read(IMG).text == ""


def test_cli_parser():
    from twinvoice_tpu.__main__ import main

    with pytest.raises(SystemExit):
        main([])  # missing subcommand
    with pytest.raises(SystemExit):
        main(["train", "--images", "/nonexistent_dir_xyz"])  # no samples
