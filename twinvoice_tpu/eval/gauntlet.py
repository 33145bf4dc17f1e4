"""Perturbation eval gauntlet — the eval quality claims must survive.

Round-1's quality numbers were measured on the same clean synthetic
distribution the models were trained on (VERDICT r1, weak #3). This module
is the fix: a held-out eval that models can *fail* —

- held-out content seeds (never seen in training),
- held-out FONTS (data.synthetic.heldout_fonts — STIX/computer-modern/
  FreeSans, visually distinct from the DejaVu training set),
- photographic perturbation levels (data.augment): clean / mild / hard
  rotation, perspective, blur, JPEG, noise, contrast, shadows, clutter.

Two measurements:
- segmenter-level: per-field IoU at the model grid + box-hit rate (does the
  padded predicted box cover the ground-truth text box?) — the quality
  column for every img/s number in docs/PERFORMANCE.md.
- end-to-end: full InvoiceExtractor (QR + segmenter + jaxocr + fusion)
  field exactness on the perturbed photo.

Reference behavior anchored: the reference leans on EasyOCR's pretrained
photo-robustness (app_camera.py:817-833) and ZXing's decode envelope
(app_camera.py:464); this gauntlet is how the rebuilt stack proves the same
envelope without those dependencies.
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from typing import Dict, List, Optional, Sequence

import numpy as np

from twinvoice_tpu import FIELDS
from twinvoice_tpu.data import augment
from twinvoice_tpu.data.synthetic import heldout_fonts, render_invoice, train_fonts

# severity per named level; None = untouched
LEVELS: Dict[str, Optional[float]] = {"clean": None, "mild": 0.35, "hard": 1.0}

# real-photo scenario tiers (VERDICT r2 #4): each applies ONE degradation
# family at representative strength over a light photographic base
SCENARIOS = ("printscan", "screenshot", "crumple", "thermal")


def _scenario_spec(name: str, rng):
    spec = augment.sample_spec(rng, 0.2)  # light base photography
    spec.background = False               # isolate the scenario effect
    if name == "printscan":
        spec.halftone = float(rng.uniform(0.5, 0.8))
        spec.halftone_cell = float(rng.uniform(2.4, 4.0))
    elif name == "screenshot":
        spec.screen_moire = float(rng.uniform(0.35, 0.6))
    elif name == "crumple":
        spec.crumple = float(rng.uniform(0.55, 0.95))
    elif name == "thermal":
        spec.thermal_fade = float(rng.uniform(0.5, 0.85))
    else:  # pragma: no cover
        raise KeyError(name)
    return spec

# content seeds are offset far away from the training generator's seed space
HELDOUT_SEED_BASE = 777_000


@dataclass
class GauntletCase:
    image: np.ndarray          # uint8 (H, W, 3), native resolution
    mask: np.ndarray           # uint8 (H, W, 3) 0/255, native resolution
    invoice_no: str
    date: str
    amount: int
    level: str = "clean"
    font: str = ""


def _random_content(rng):
    letters = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
    inv_no = "".join(rng.choice(list(letters), 2)) + "".join(
        rng.choice(list("0123456789"), 8)
    )
    date = f"{rng.integers(2019, 2031)}-{rng.integers(1, 13):02d}-{rng.integers(1, 29):02d}"
    amount = int(rng.integers(1, 99999))
    return inv_no, date, amount


def make_base_cases(
    n: int,
    *,
    seed: int = HELDOUT_SEED_BASE,
    use_heldout_fonts: bool = False,
    layout_jitter: float = 0.6,
    items: Optional[List[dict]] = None,
    dot_print: bool = False,
) -> List[GauntletCase]:
    """Render n held-out invoices at native resolution (no perturbation).
    ``dot_print`` renders the text through the dot-matrix printhead
    simulation (the physical TW invoice medium)."""
    rng = np.random.default_rng(seed)
    fonts = heldout_fonts() if use_heldout_fonts else train_fonts()
    cases = []
    for i in range(n):
        inv_no, date, amount = _random_content(rng)
        w = int(rng.integers(360, 560))
        h = int(rng.integers(560, 760))
        font = fonts[int(rng.integers(0, len(fonts)))]
        img, boxes = render_invoice(
            inv_no, date, amount,
            items=items or [{"name": "測試品項", "qty": 1, "price": amount}],
            size=(w, h), seed=seed + i,
            font_path=font, font_size=int(rng.integers(18, 27)),
            layout_jitter=layout_jitter, dot_print=dot_print,
        )
        arr = np.asarray(img)
        mask = np.zeros((h, w, 3), np.uint8)
        for c, f in enumerate(FIELDS):
            x1, y1, x2, y2 = boxes[f]
            mask[y1 : y2 + 1, x1 : x2 + 1, c] = 255
        cases.append(GauntletCase(arr, mask, inv_no, date, amount,
                                  font=font.rsplit("/", 1)[-1]))
    return cases


def perturb_cases(
    cases: Sequence[GauntletCase], level: str, seed: int = 0
) -> List[GauntletCase]:
    """Apply one named perturbation level or scenario to every case
    (native res). Levels are severity presets; scenarios (SCENARIOS) apply
    one real-photo degradation family at representative strength."""
    if level in SCENARIOS:
        rng = np.random.default_rng(seed + sum(map(ord, level)))
        out = []
        for c in cases:
            img, mask = augment.apply_spec(
                c.image, c.mask, _scenario_spec(level, rng), rng
            )
            out.append(replace(c, image=img, mask=mask, level=level))
        return out
    sev = LEVELS[level]
    if sev is None:
        return [replace(c, level="clean") for c in cases]
    rng = np.random.default_rng(seed + int(sev * 1000))
    out = []
    for c in cases:
        img, mask = augment.perturb(c.image, c.mask, rng, sev)
        out.append(replace(c, image=img, mask=mask, level=level))
    return out


# ------------------------------------------------------------ segmenter IoU


def _resize_case(c: GauntletCase, size: int):
    import cv2

    img = cv2.resize(c.image, (size, size), interpolation=cv2.INTER_LINEAR)
    mask = cv2.resize(c.mask, (size, size), interpolation=cv2.INTER_NEAREST)
    return img, mask


def run_segmenter_gauntlet(segmenter, cases: Sequence[GauntletCase]) -> dict:
    """Per-field IoU (at the model grid) + box-hit rate for one case list.

    box-hit: the model's padded predicted box (Segmenter's scale/pad output)
    covers ≥70% of the ground-truth text box area — i.e. the OCR crop would
    contain the field. That's the metric the downstream pipeline cares about.
    """
    size = segmenter.cfg.img_size
    imgs = np.zeros((len(cases), size, size, 3), np.uint8)
    gts = np.zeros((len(cases), size, size, 3), bool)
    sizes = np.zeros((len(cases), 2), np.int32)
    for i, c in enumerate(cases):
        img, mask = _resize_case(c, size)
        imgs[i], gts[i] = img, mask > 127
        sizes[i] = (c.image.shape[1], c.image.shape[0])  # (ow, oh)

    pred, boxes, ok = segmenter.segment_batch(imgs, sizes)
    pred = np.asarray(pred)
    boxes = np.asarray(boxes)
    ok = np.asarray(ok)

    inter = (pred & gts).sum((1, 2)).astype(np.float64)
    union = (pred | gts).sum((1, 2)).astype(np.float64)
    iou = inter / np.maximum(union, 1.0)           # (N, 3)

    hits = np.zeros((len(cases), 3), bool)
    for i, c in enumerate(cases):
        gt_boxes = augment.boxes_from_mask(c.mask)  # native-res GT
        for f in range(3):
            if f not in gt_boxes:
                hits[i, f] = not ok[i, f]           # field gone: None is right
                continue
            if not ok[i, f]:
                continue
            gx1, gy1, gx2, gy2 = gt_boxes[f]
            px1, py1, px2, py2 = boxes[i, f]
            ix1, iy1 = max(gx1, px1), max(gy1, py1)
            ix2, iy2 = min(gx2, px2), min(gy2, py2)
            inter_a = max(0, ix2 - ix1) * max(0, iy2 - iy1)
            gt_a = max(1, (gx2 - gx1) * (gy2 - gy1))
            hits[i, f] = inter_a / gt_a >= 0.7
    return {
        "n": len(cases),
        "iou": iou.mean(0).tolist(),
        "iou_mean": float(iou.mean()),
        "box_hit": hits.mean(0).tolist(),
        "box_hit_mean": float(hits.mean()),
    }


# ----------------------------------------------------------------- e2e


def run_e2e_gauntlet(extractor, cases: Sequence[GauntletCase]) -> dict:
    """Full-pipeline field exactness on perturbed photos."""
    from PIL import Image

    hits = {"invoice_no": 0, "date": 0, "amount": 0}
    for c in cases:
        extractor.clear_cache()
        meta, items, _ = extractor.extract(Image.fromarray(c.image))
        hits["invoice_no"] += meta.get("invoice_no") == c.invoice_no
        hits["date"] += meta.get("date") == c.date
        hits["amount"] += meta.get("total_amount") == str(c.amount)
    n = max(len(cases), 1)
    return {
        "n": len(cases),
        "invoice_no_acc": hits["invoice_no"] / n,
        "date_acc": hits["date"] / n,
        "amount_acc": hits["amount"] / n,
    }
