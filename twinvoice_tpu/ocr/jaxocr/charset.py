"""Recognizer charset: blank + the symbols that occur on TW invoice fields
(invoice numbers [A-Z]{2}\\d{8}, western/ROC dates, integer amounts)."""

from __future__ import annotations

from typing import List

BLANK = 0
CHARSET = " 0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZ-./:,$#*()"  # index 1..len
NUM_CLASSES = len(CHARSET) + 1  # + blank

_TO_ID = {c: i + 1 for i, c in enumerate(CHARSET)}
_TO_CHAR = {i + 1: c for i, c in enumerate(CHARSET)}


def encode_text(text: str) -> List[int]:
    """Text → label ids; unknown chars are dropped (not mapped to blank)."""
    return [_TO_ID[c] for c in text.upper() if c in _TO_ID]


def decode_ids(ids) -> str:
    """CTC-collapsed ids → text (ids must already be collapsed/deduped)."""
    return "".join(_TO_CHAR.get(int(i), "") for i in ids if int(i) != BLANK)


def greedy_ctc_decode(class_ids) -> str:
    """Raw per-timestep argmax ids → text (collapse repeats, drop blanks)."""
    out = []
    prev = -1
    for i in class_ids:
        i = int(i)
        if i != prev and i != BLANK:
            out.append(i)
        prev = i
    return decode_ids(out)
