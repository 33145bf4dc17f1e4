"""Held-out-font end-to-end field accuracy WITHOUT QR — the recognizer-
bound row of BASELINE config 4 (docs/PERFORMANCE.md: r3 measured
0.6/0.8/0.8 inv/date/amount at n=10; the residual misses are the
recognizer reading unfamiliar glyph shapes).

Usage: python scripts/eval_e2e_heldout.py [n] [--recognizer path.npz]
           [--beam | --greedy] [--dot]

Default decode is "cascade" — the engine's serving default (greedy with
beam+LM escalation on uncertain lines), so the published e2e numbers are
the served numbers. --beam forces beam_lm on every line; --greedy forces
pure greedy (the r1-r4 serving behavior).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")

    n = 25
    rec_path = None
    args = [a for a in sys.argv[1:]]
    if args and args[0].isdigit():
        n = int(args.pop(0))
    if "--recognizer" in args:
        rec_path = args[args.index("--recognizer") + 1]
    decode = ("beam_lm" if "--beam" in args
              else "greedy" if "--greedy" in args else "cascade")
    dot = "--dot" in args

    from twinvoice_tpu.config import FusionConfig
    from twinvoice_tpu.eval.gauntlet import (
        make_base_cases,
        perturb_cases,
        run_e2e_gauntlet,
    )
    from twinvoice_tpu.fusion.extract import InvoiceExtractor
    from twinvoice_tpu.models import pretrained
    from twinvoice_tpu.ocr.jaxocr.engine import JaxOcrEngine

    seg = pretrained.load_pretrained_segmenter()
    eng = JaxOcrEngine(weights_dir=rec_path, decode=decode) if rec_path \
        else JaxOcrEngine(decode=decode)
    print(f"recognizer: {rec_path or 'bundled'} arch={eng.arch} "
          f"charset={eng.charset.num_classes} decode={decode}", flush=True)
    ex = InvoiceExtractor(seg, None, [eng],
                          FusionConfig(auto_rotate=False, use_qr=False))

    bases = make_base_cases(n, use_heldout_fonts=True, dot_print=dot)
    for level in ("clean", "mild"):
        cases = perturb_cases(bases, level, seed=7)
        res = run_e2e_gauntlet(ex, cases)
        print(json.dumps({"level": f"{level}+heldoutfont"
                          + ("+dotprint" if dot else ""), "no_qr": True,
                          **res}), flush=True)


if __name__ == "__main__":
    main()
