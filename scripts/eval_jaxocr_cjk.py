"""CJK recognizer eval: exact-match + CER on FRESH stroke-font-rendered
lines, split by text kind (pure-CJK item names vs mixed vs ASCII fields).

Reports BOTH decode policies the shipped engine offers: greedy argmax
(the serving hot path) and LM-fused prefix beam search
(charset.beam_ctc_decode + lm.default_lm — the accuracy path).

The bundled weights embed their charset; this reports what the shipped
recognizer can actually read (VERDICT r1 #4). Usage:
  python scripts/eval_jaxocr_cjk.py [weights.npz] [n_batches] [--dot]

--dot renders every eval line through the dot-matrix printhead
simulation (data.dot_matrix) — the physical TW invoice print medium —
and reports that tier instead of the standard distribution.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(weights=None, n_batches=6, batch=64, dot=False):
    import jax
    import jax.numpy as jnp

    from twinvoice_tpu.ocr.jaxocr import data as D
    from twinvoice_tpu.ocr.jaxocr.charset import beam_ctc_decode
    from twinvoice_tpu.ocr.jaxocr.lm import default_lm
    from twinvoice_tpu.ocr.jaxocr.model import crnn_apply
    from twinvoice_tpu.ocr.jaxocr.train import (
        DEFAULT_WEIGHTS_PATH, _levenshtein, load_weights_ex,
    )

    params, state, charset, arch = load_weights_ex(weights or DEFAULT_WEIGHTS_PATH)
    has_cjk = any(ord(c) > 0x2E00 for c in charset.chars)
    lm = default_lm()

    def _infer(p, s, x):
        logits = crnn_apply(p, s, x, train=False, arch=arch)[0]
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        tk_lp, tk_ids = jax.lax.top_k(logp, 8)
        return jnp.argmax(logits, axis=-1), tk_ids, tk_lp, logp[..., 0]

    infer = jax.jit(_infer)

    rng = np.random.default_rng(4242)
    stats = {}
    for _ in range(n_batches):
        imgs, labels, pad, texts = D.make_batch(
            batch, rng, charset, dot_frac=1.0 if dot else 0.0)
        ids, tk_ids, tk_lp, blank_lp = (
            np.asarray(a) for a in infer(params, state, jnp.asarray(imgs))
        )
        for k, text in enumerate(texts):
            got = charset.greedy_ctc_decode(ids[k])
            got_beam, _ = beam_ctc_decode(
                charset, tk_ids[k], tk_lp[k], blank_lp[k], lm=lm)
            kind = (
                "cjk" if all(ord(c) > 0x2E00 or c == " " for c in text) and
                any(ord(c) > 0x2E00 for c in text)
                else "mixed" if any(ord(c) > 0x2E00 for c in text)
                else "ascii"
            )
            st = stats.setdefault(kind, {"n": 0, "exact": 0, "errs": 0,
                                         "chars": 0, "exact_beam": 0,
                                         "errs_beam": 0})
            st["n"] += 1
            st["exact"] += got == text
            st["errs"] += _levenshtein(got, text)
            st["exact_beam"] += got_beam == text
            st["errs_beam"] += _levenshtein(got_beam, text)
            st["chars"] += max(1, len(text))

    out = {"weights": weights or DEFAULT_WEIGHTS_PATH,
           "charset_size": charset.num_classes, "cjk_capable": has_cjk,
           "tier": "dotmatrix" if dot else "standard"}
    for kind, st in sorted(stats.items()):
        out[f"{kind}_exact"] = round(st["exact"] / st["n"], 4)
        out[f"{kind}_cer"] = round(st["errs"] / st["chars"], 4)
        out[f"{kind}_exact_beam"] = round(st["exact_beam"] / st["n"], 4)
        out[f"{kind}_cer_beam"] = round(st["errs_beam"] / st["chars"], 4)
        out[f"{kind}_n"] = st["n"]
    print(json.dumps(out))


if __name__ == "__main__":
    argv = [a for a in sys.argv[1:] if a != "--dot"]
    w = argv[0] if argv else None
    nb = int(argv[1]) if len(argv) > 1 else 6
    main(w, nb, dot="--dot" in sys.argv)
