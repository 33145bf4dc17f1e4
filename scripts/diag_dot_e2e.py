"""Diagnose the e2e dot-print gap: read GT field crops from dot-printed
invoices directly with the recognizer, under several preprocessing
variants, to separate (a) segmenter error (b) dot-scale mismatch
(c) recoverable-by-preproc.

Usage: python scripts/diag_dot_e2e.py [n] [weights.npz]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import cv2

    from twinvoice_tpu.eval.gauntlet import make_base_cases, perturb_cases
    from twinvoice_tpu.ocr.jaxocr.engine import JaxOcrEngine

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 25
    wpath = sys.argv[2] if len(sys.argv) > 2 else None
    eng = (JaxOcrEngine(weights_dir=wpath, decode="cascade") if wpath
           else JaxOcrEngine(decode="cascade"))

    bases = make_base_cases(n, use_heldout_fonts=True, dot_print=True)
    cases = perturb_cases(bases, "clean", seed=7)

    FIELDS = ["invoice_no", "date", "total_amount"]

    def norm(s):
        return "".join(c for c in s.upper() if c.isalnum())

    variants = {
        "raw": lambda a: a,
        "blur": lambda a: cv2.GaussianBlur(a, (0, 0), 1.2),
        "close": lambda a: cv2.erode(a, np.ones((3, 3), np.uint8)),
        "blur2x": lambda a: cv2.GaussianBlur(
            cv2.resize(a, (a.shape[1] * 2, a.shape[0] * 2),
                       interpolation=cv2.INTER_CUBIC), (0, 0), 1.6),
    }
    hits = {v: {f: 0 for f in FIELDS} for v in variants}

    for case in cases:
        img = case.image
        gray = cv2.cvtColor(img, cv2.COLOR_RGB2GRAY) if img.ndim == 3 else img
        gts = {"invoice_no": case.invoice_no, "date": case.date,
               "total_amount": str(case.amount)}
        # GT boxes from the mask channels (survives perturbation geometry)
        for c, f in enumerate(FIELDS):
            ys, xs = np.where(case.mask[..., c] > 127)
            if len(xs) == 0:
                continue
            y0, y1, x0, x1 = ys.min(), ys.max(), xs.min(), xs.max()
            ph = int(0.15 * (y1 - y0 + 1))
            pw = int(0.15 * (x1 - x0 + 1))
            crop = gray[max(0, y0 - ph): y1 + ph + 1,
                        max(0, x0 - pw): x1 + pw + 1]
            if crop.size == 0:
                continue
            for vname, vf in variants.items():
                mode = ("amount" if f == "total_amount" else
                        "date" if f == "date" else "invoice")
                got = eng.read(vf(crop), mode=mode).text
                gn, tn = norm(got), norm(gts[f])
                if f == "date":
                    ok = "".join(ch for ch in gn if ch.isdigit()) == \
                         "".join(ch for ch in tn if ch.isdigit())
                else:
                    ok = gn == tn or (f == "invoice_no" and gn == tn.replace("-", ""))
                hits[vname][f] += int(ok)
                if vname == "raw" and not ok and sum(
                        hits["raw"][x] for x in FIELDS) < 6:
                    print(f"  miss {f}: got={got!r} gt={gts[f]!r} "
                          f"crop={crop.shape}")

    print(f"n={n} GT-crop reads (segmenter excluded):")
    for vname in variants:
        row = {f: hits[vname][f] / n for f in FIELDS}
        print(f"  {vname:7s} " + "  ".join(f"{f}={row[f]:.2f}" for f in FIELDS))


if __name__ == "__main__":
    main()
