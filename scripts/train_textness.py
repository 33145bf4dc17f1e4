"""Train the learned textness head and A/B it against the classical
detector (VERDICT r2 #8).

Eval: box-level precision/recall of detect_lines on held-out synthetic
text pages across perturbation tiers (mild/hard + the real-photo scenario
tiers). A GT line counts as found when some predicted box reaches IoU ≥
0.3; a prediction is a false positive when it matches no GT box.

Usage:
  python scripts/train_textness.py [--steps N] [--eval-n N] [--promote]

--promote copies the trained weights into the package (making them the
"auto" method's choice); do this only when the A/B table says learned wins.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

TMP_PATH = "/tmp/textness_v1.npz"


def _boxes_from_mask(mask):
    import cv2

    n, _, stats, _ = cv2.connectedComponentsWithStats(
        (mask > 127).astype(np.uint8), connectivity=8)
    out = []
    for i in range(1, n):
        x, y, w, h, area = stats[i]
        if area >= 40:
            out.append((x, y, x + w, y + h))
    return out


def _iou(a, b):
    ax1, ay1, ax2, ay2 = a
    bx1, by1, bx2, by2 = b
    ix = max(0, min(ax2, bx2) - max(ax1, bx1))
    iy = max(0, min(ay2, by2) - max(ay1, by1))
    inter = ix * iy
    ua = (ax2 - ax1) * (ay2 - ay1) + (bx2 - bx1) * (by2 - by1) - inter
    return inter / max(ua, 1)


def _pr(pred, gt, thr=0.3):
    tp = sum(1 for g in gt if any(_iou(g, p) >= thr for p in pred))
    fp = sum(1 for p in pred if all(_iou(g, p) < thr for g in gt))
    return tp, fp, len(gt)


def evaluate(n=30, seed=123_000):
    from twinvoice_tpu.data import augment
    from twinvoice_tpu.eval.gauntlet import SCENARIOS, _scenario_spec
    from twinvoice_tpu.ocr.jaxocr.detector import detect_lines
    from twinvoice_tpu.ocr.jaxocr.textness import render_textpage

    tiers = [("mild", 0.35), ("hard", 1.0)] + [(s, None) for s in SCENARIOS]
    rows = {}
    for tier, sev in tiers:
        rng = np.random.default_rng(seed + sum(map(ord, tier)))
        stats = {m: [0, 0, 0] for m in ("classical", "learned", "hybrid")}
        for i in range(n):
            gray, mask = render_textpage(rng, size=256, severity=0.0)
            img3 = np.repeat(gray[..., None], 3, -1)
            if sev is not None:
                img3, m = augment.perturb(img3, mask[..., None], rng, sev)
            else:
                spec = _scenario_spec(tier, rng)
                img3, m = augment.apply_spec(img3, mask[..., None], spec, rng)
            gt = _boxes_from_mask(m[..., 0])
            if not gt:
                continue
            import cv2

            g = cv2.cvtColor(img3, cv2.COLOR_RGB2GRAY)
            for method in ("classical", "learned", "hybrid"):
                pred = detect_lines(g, method=method)
                tp, fp, ng = _pr(pred, gt)
                stats[method][0] += tp
                stats[method][1] += fp
                stats[method][2] += ng
        rows[tier] = {
            m: {
                "recall": round(s[0] / max(s[2], 1), 3),
                "precision": round(s[0] / max(s[0] + s[1], 1), 3),
            }
            for m, s in stats.items()
        }
        print(tier, rows[tier], flush=True)
    print("\n| tier | classical R/P | learned R/P | hybrid R/P |")
    print("|---|---|---|---|")
    for tier, r in rows.items():
        c, l, hy = r["classical"], r["learned"], r["hybrid"]
        print(f"| {tier} | {c['recall']:.2f}/{c['precision']:.2f} "
              f"| {l['recall']:.2f}/{l['precision']:.2f} "
              f"| {hy['recall']:.2f}/{hy['precision']:.2f} |")
    return rows


def main():
    import shutil

    from twinvoice_tpu.ocr.jaxocr import textness

    steps = 1500
    if "--steps" in sys.argv:
        steps = int(sys.argv[sys.argv.index("--steps") + 1])
    eval_n = 30
    if "--eval-n" in sys.argv:
        eval_n = int(sys.argv[sys.argv.index("--eval-n") + 1])

    if steps > 0:
        textness.train(steps=steps, out_path=TMP_PATH)
    # point the lazy loader at the fresh weights for the A/B
    from twinvoice_tpu.ocr.jaxocr import detector

    detector._learned_params = textness.load_textness(TMP_PATH)
    assert detector._learned_params is not None
    evaluate(eval_n)

    if "--promote" in sys.argv:
        shutil.copy(TMP_PATH, textness.DEFAULT_TEXTNESS_PATH)
        print(f"promoted -> {textness.DEFAULT_TEXTNESS_PATH}")


if __name__ == "__main__":
    main()
