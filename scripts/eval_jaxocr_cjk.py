"""CJK recognizer eval: exact-match + CER on FRESH stroke-font-rendered
lines, split by text kind (pure-CJK item names vs mixed vs ASCII fields).

The bundled weights embed their charset; this reports what the shipped
recognizer can actually read (VERDICT r1 #4). Usage:
  python scripts/eval_jaxocr_cjk.py [weights.npz] [n_batches]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(weights=None, n_batches=6, batch=64):
    import jax
    import jax.numpy as jnp

    from twinvoice_tpu.ocr.jaxocr import data as D
    from twinvoice_tpu.ocr.jaxocr.model import crnn_apply
    from twinvoice_tpu.ocr.jaxocr.train import (
        DEFAULT_WEIGHTS_PATH, _levenshtein, load_weights_ex,
    )

    params, state, charset, arch = load_weights_ex(weights or DEFAULT_WEIGHTS_PATH)
    has_cjk = any(ord(c) > 0x2E00 for c in charset.chars)
    infer = jax.jit(lambda p, s, x: crnn_apply(p, s, x, train=False, arch=arch)[0])

    rng = np.random.default_rng(4242)
    stats = {}
    for _ in range(n_batches):
        imgs, labels, pad, texts = D.make_batch(batch, rng, charset)
        logits = infer(params, state, jnp.asarray(imgs))
        ids = np.asarray(jnp.argmax(logits, axis=-1))
        for row, text in zip(ids, texts):
            got = charset.greedy_ctc_decode(row)
            kind = (
                "cjk" if all(ord(c) > 0x2E00 or c == " " for c in text) and
                any(ord(c) > 0x2E00 for c in text)
                else "mixed" if any(ord(c) > 0x2E00 for c in text)
                else "ascii"
            )
            st = stats.setdefault(kind, {"n": 0, "exact": 0, "errs": 0, "chars": 0})
            st["n"] += 1
            st["exact"] += got == text
            st["errs"] += _levenshtein(got, text)
            st["chars"] += max(1, len(text))

    out = {"weights": weights or DEFAULT_WEIGHTS_PATH,
           "charset_size": charset.num_classes, "cjk_capable": has_cjk}
    for kind, st in sorted(stats.items()):
        out[f"{kind}_exact"] = round(st["exact"] / st["n"], 4)
        out[f"{kind}_cer"] = round(st["errs"] / st["chars"], 4)
        out[f"{kind}_n"] = st["n"]
    print(json.dumps(out))


if __name__ == "__main__":
    w = sys.argv[1] if len(sys.argv) > 1 else None
    nb = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    main(w, nb)
