"""Recognizer charsets.

The default covers the symbols on TW invoice *fields* (invoice numbers
[A-Z]{2}\\d{8}, western/ROC dates, integer amounts). The CJK charset adds
every Traditional-Chinese glyph the in-repo stroke font can draw
(ocr/fonts), giving the recognizer the reference's EasyOCR ``ch_tra``
capability (app_camera.py:73) for item names and receipt labels.

Weights files embed their charset string (train.save_weights), so a loaded
model always decodes with the alphabet it was trained on.
"""

from __future__ import annotations

from typing import List

BLANK = 0
CHARSET = " 0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZ-./:,$#*()"  # index 1..len


class Charset:
    """Bidirectional char↔id table with CTC blank at id 0."""

    def __init__(self, chars: str = CHARSET):
        self.chars = chars
        self.num_classes = len(chars) + 1  # + blank
        self._to_id = {c: i + 1 for i, c in enumerate(chars)}
        self._to_char = {i + 1: c for i, c in enumerate(chars)}

    def encode_text(self, text: str) -> List[int]:
        """Text → label ids; unknown chars are dropped (not mapped to blank)."""
        return [self._to_id[c] for c in text.upper() if c in self._to_id]

    def decode_ids(self, ids) -> str:
        """CTC-collapsed ids → text (ids must already be collapsed/deduped)."""
        return "".join(self._to_char.get(int(i), "") for i in ids if int(i) != BLANK)

    def greedy_ctc_decode(self, class_ids) -> str:
        """Raw per-timestep argmax ids → text (collapse repeats, drop blanks)."""
        out = []
        prev = -1
        for i in class_ids:
            i = int(i)
            if i != prev and i != BLANK:
                out.append(i)
            prev = i
        return self.decode_ids(out)


DEFAULT = Charset(CHARSET)
NUM_CLASSES = DEFAULT.num_classes


def cjk_charset() -> Charset:
    """ASCII field charset + every glyph the stroke font covers."""
    from twinvoice_tpu.ocr.fonts import strokefont

    cjk = "".join(sorted(strokefont.coverage()))
    return Charset(CHARSET + cjk)


# module-level functions kept for existing callers (default charset)
def encode_text(text: str) -> List[int]:
    return DEFAULT.encode_text(text)


def decode_ids(ids) -> str:
    return DEFAULT.decode_ids(ids)


def greedy_ctc_decode(class_ids) -> str:
    return DEFAULT.greedy_ctc_decode(class_ids)
