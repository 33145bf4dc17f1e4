"""Character n-gram language model over the invoice text domain.

TW e-invoice text is rigidly structured — ``[A-Z]{2}\\d{8}`` invoice
numbers, ``yyyy/mm/dd`` and ROC dates, comma-grouped amounts, a small CJK
item-name vocabulary — so a tiny char 4-gram captures most of the prior.
Fused into CTC prefix beam search (:func:`.charset.beam_ctc_decode`) it
disambiguates pure-vision ties (0↔O in a digit slot, spurious/dropped
spaces) the way EasyOCR's pretrained implicit LM does for the reference
(app_camera.py:817-833), but trained on *this* domain's distribution.

The model is built from the synthetic text generator itself
(:func:`.data.random_field_text` — the same prior the deployed pipeline
reads), with a fixed seed so the asset is reproducible. ``^``/``$`` mark
string start/end.
"""

from __future__ import annotations

import gzip
import json
import math
import os
from collections import Counter, defaultdict

import numpy as np

MAX_ORDER = 4  # contexts of length 0..3
DEFAULT_LM_PATH = os.path.join(os.path.dirname(__file__), "lm4.json.gz")


class CharNgramLM:
    """Interpolated-backoff char n-gram: P(c|ctx) mixes orders 1..4.

    ``logp(ctx, c)``: ``ctx`` is the full emitted prefix prefixed with
    ``"^"``; only the last ``MAX_ORDER-1`` chars are used. ``c`` may be
    ``"$"`` for end-of-string.
    """

    def __init__(self, grams, vocab_size: int):
        # grams[k]: dict ctx(len k) -> (total, dict char -> count)
        self.grams = grams
        self.V = vocab_size
        self.order = MAX_ORDER  # context length consumers may truncate to
        self._interp = 0.65
        self._smooth = 0.1
        self._cache: dict = {}  # (ctx[-3:], c) -> logp; contexts repeat
        # heavily across beam prefixes and frames (~5x decode speedup)

    def logp(self, ctx: str, c: str) -> float:
        ctx = ctx[-(MAX_ORDER - 1):]
        key = (ctx, c)
        v = self._cache.get(key)
        if v is not None:
            return v
        p = 1.0 / self.V
        w, s, V = self._interp, self._smooth, self.V
        for k in range(MAX_ORDER):
            cc = ctx[len(ctx) - k:] if k else ""
            e = self.grams[k].get(cc)
            if e is not None:
                tot, d = e
                p = (1.0 - w) * p + w * (d.get(c, 0) + s) / (tot + s * V)
        v = math.log(p)
        if len(self._cache) < 2_000_000:
            self._cache[key] = v
        return v

    # ------------------------------------------------------------- build
    @classmethod
    def build(cls, charset=None, n_samples: int = 120000, seed: int = 1):
        """Build from the training text generator (NOT from any eval set:
        eval seeds are 7/4242/99+; the LM uses seed 1 samples only)."""
        from . import data as D
        from .charset import DEFAULT

        charset = charset or DEFAULT
        rng = np.random.default_rng(seed)
        raw = [defaultdict(Counter) for _ in range(MAX_ORDER)]
        for _ in range(n_samples):
            t = "^" + D.random_field_text(rng, charset) + "$"
            for j in range(1, len(t)):
                for k in range(MAX_ORDER):
                    if j - k >= 0:
                        raw[k][t[j - k:j]][t[j]] += 1
        grams = [{ctx: (sum(d.values()), dict(d)) for ctx, d in g.items()}
                 for g in raw]
        return cls(grams, charset.num_classes + 2)

    # --------------------------------------------------------- save/load
    def save(self, path: str = DEFAULT_LM_PATH):
        obj = {"V": self.V,
               "grams": [{ctx: [tot, d] for ctx, (tot, d) in g.items()}
                         for g in self.grams]}
        with gzip.open(path, "wt", encoding="utf-8") as f:
            json.dump(obj, f, ensure_ascii=False, separators=(",", ":"))

    @classmethod
    def load(cls, path: str = DEFAULT_LM_PATH):
        with gzip.open(path, "rt", encoding="utf-8") as f:
            obj = json.load(f)
        grams = [{ctx: (tot_d[0], tot_d[1]) for ctx, tot_d in g.items()}
                 for g in obj["grams"]]
        return cls(grams, obj["V"])


_default = None


def default_lm() -> CharNgramLM:
    """The bundled domain LM (loaded once per process); builds and caches
    the asset on first use if it doesn't exist yet."""
    global _default
    if _default is None:
        if os.path.exists(DEFAULT_LM_PATH):
            _default = CharNgramLM.load(DEFAULT_LM_PATH)
        else:  # pragma: no cover - asset ships with the repo
            from .charset import cjk_charset

            _default = CharNgramLM.build(cjk_charset())
            try:
                _default.save(DEFAULT_LM_PATH)
            except OSError:
                pass
    return _default
