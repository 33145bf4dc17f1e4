"""Synthetic Taiwanese e-invoice renderer — test/eval fixture generator.

Renders a receipt-like image with the three text fields at known positions
and the two real QR codes (header + TEXT items, via our own encoder), plus
the labelme-style ground-truth shapes. Used by the e2e tests (SURVEY.md §4.5)
and the OCR eval config (BASELINE config 4).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np


def iso_to_roc(date_iso: str) -> str:
    """``2025-09-09`` → ``1140909`` (ROC calendar)."""
    y, m, d = date_iso.split("-")
    return f"{int(y) - 1911}{int(m):02d}{int(d):02d}"


def header_qr_payload(invoice_no: str, date_iso: str, amount: int = 0) -> str:
    """Realistic header-QR payload: number + ROC date + random-looking tail."""
    return f"{invoice_no}{iso_to_roc(date_iso)}1234:{amount:08x}:0:0:0:AAAA/BBBBCCCC=="


def items_qr_payload(items: List[dict]) -> str:
    body = ":".join(f"{it['name']}:{it['qty']}:{it['price']}" for it in items)
    return "**" + body


# Font registry for render variety. TRAIN_FONTS feed training data;
# HELDOUT_FONTS are never trained on — the eval gauntlet uses them to
# measure font generalization (VERDICT r1 #3 "rendered-but-different-fonts").
import os as _os

_DEJAVU = "/usr/share/fonts/truetype/dejavu"
_MPL = None


def _mpl_font_dir():
    global _MPL
    if _MPL is None:
        try:
            import matplotlib

            _MPL = _os.path.join(
                _os.path.dirname(matplotlib.__file__), "mpl-data", "fonts", "ttf"
            )
        except Exception:
            _MPL = ""
    return _MPL


def _existing(paths):
    return [p for p in paths if p and _os.path.exists(p)]


def train_fonts() -> List[str]:
    """Every *training-eligible* typeface discoverable in this image
    (VERDICT r2 #3: diversify training typography). The held-out families
    (STIX, Computer Modern, pygame's FreeSans/sans, Playfair) are NEVER
    listed here — the gauntlet's font-generalization tier depends on it."""
    mpl = _mpl_font_dir()
    # .../site-packages/matplotlib/mpl-data/fonts/ttf -> site-packages
    site = _os.path.dirname(_os.path.dirname(
        _os.path.dirname(_os.path.dirname(mpl)))) if mpl else ""
    extra = []
    if mpl:
        extra += [
            _os.path.join(mpl, f)
            for f in (
                # the two *Display.ttf supplements render NO basic-latin
                # glyphs (probed) — excluded
                "DejaVuSans-Oblique.ttf", "DejaVuSans-BoldOblique.ttf",
                "DejaVuSansMono-Oblique.ttf",
                "DejaVuSansMono-BoldOblique.ttf", "DejaVuSerif-Bold.ttf",
                "DejaVuSerif-Italic.ttf", "DejaVuSerif-BoldItalic.ttf",
            )
        ]
    if site:
        extra += [
            _os.path.join(site, "mujoco", "experimental", "studio", "assets",
                          "AtkinsonHyperlegibleNext[wght].ttf"),
            _os.path.join(site, "gymnasium", "envs", "toy_text", "font",
                          "Minecraft.ttf"),
        ]
    return _existing(
        [
            _os.path.join(_DEJAVU, "DejaVuSansMono.ttf"),
            _os.path.join(_DEJAVU, "DejaVuSans.ttf"),
            _os.path.join(_DEJAVU, "DejaVuSerif.ttf"),
            _os.path.join(_DEJAVU, "DejaVuSansMono-Bold.ttf"),
            _os.path.join(_DEJAVU, "DejaVuSans-Bold.ttf"),
        ]
        + extra
    )


def heldout_fonts() -> List[str]:
    import glob as _glob

    mpl = _mpl_font_dir()
    cands = [
        _os.path.join(mpl, "STIXGeneral.ttf") if mpl else "",
        _os.path.join(mpl, "STIXGeneralBol.ttf") if mpl else "",
        _os.path.join(mpl, "cmr10.ttf") if mpl else "",
        _os.path.join(mpl, "cmss10.ttf") if mpl else "",
        # DejaVuSerif-Bold was listed here through r4 — a LEAK: r2 also
        # added it to train_fonts, so the "held-out" tier partially
        # measured a trained font. Removed r5 (rows re-measured; the tier
        # now contains only never-trained families, per the train_fonts
        # docstring). Disclosed in docs/PARITY.md.
    ]
    try:
        import pygame

        pg = _os.path.dirname(pygame.__file__)
        cands += [
            _os.path.join(pg, "freesansbold.ttf"),
            _os.path.join(pg, "examples", "data", "sans.ttf"),
            _os.path.join(pg, "tests", "fixtures", "fonts",
                          "PlayfairDisplaySemibold.ttf"),
        ]
    except Exception:
        pass
    out = _existing(cands)
    return out or train_fonts()  # degrade gracefully off this box


def _draw_stylized_value(img, text, font, xy, line_h, rng, stylize):
    """Draw ``text`` through a random typography transform and paste at
    ``xy``. Returns the ground-truth box (x1, y1, x2, y2) of the pasted ink.

    Transform space (each effect scaled by ``stylize``):
    - tracking: extra per-character spacing (0..4 px)
    - weight: morphological dilate (bolder) / erode (lighter) of the ink
    - slant: horizontal shear within ±0.30
    - aspect: horizontal stretch ×(0.78..1.35)
    """
    import cv2
    from PIL import Image, ImageDraw

    x, y = xy
    tracking = int(round(rng.uniform(0, 4) * stylize * (rng.uniform() < 0.5)))
    # render onto a generous grayscale tile (white paper, black ink)
    pad = 8
    est_w = int(sum(font.getlength(ch) for ch in text)
                + tracking * len(text) + 2 * pad + 8)
    tile = Image.new("L", (est_w, line_h + 2 * pad + 8), 255)
    td = ImageDraw.Draw(tile)
    cx = pad
    for ch in text:
        td.text((cx, pad), ch, fill=0, font=font)
        cx += font.getlength(ch) + tracking
    t = np.asarray(tile)

    r = rng.uniform()
    if r < 0.35 * stylize:
        t = cv2.erode(t, np.ones((2, 2), np.uint8))      # ink spreads: bolder
    elif r < 0.6 * stylize:
        t = cv2.dilate(t, np.ones((2, 2), np.uint8))     # ink shrinks: lighter
    shear = rng.uniform(-0.30, 0.30) * stylize
    sx = 1.0 + rng.uniform(-0.22, 0.35) * stylize
    h0, w0 = t.shape
    m = np.array([[sx, shear, abs(shear) * h0], [0, 1, 0]], np.float32)
    w1 = int(w0 * sx + abs(shear) * h0 + 2)
    t = cv2.warpAffine(t, m, (w1, h0), flags=cv2.INTER_LINEAR,
                       borderMode=cv2.BORDER_CONSTANT, borderValue=255)

    ys, xs = np.where(t < 200)
    if len(xs) == 0:  # degenerate; fall back to plain drawing
        ImageDraw.Draw(img).text((x, y), text, fill=(20, 20, 20), font=font)
        return (x, y, int(x + font.getlength(text)), y + line_h)
    # Crop columns to the ink extent but KEEP the legacy vertical band
    # (rows pad..pad+line_h ↔ image rows y..y+line_h): the ground-truth
    # convention everywhere else is (x, y, x+text_width, y+line_h) — the
    # r3 first cut returned tight-ink boxes and every downstream IoU
    # silently dropped ~0.3 from the convention mismatch alone.
    x0i, x1i = xs.min(), xs.max() + 1
    t = t[pad : pad + line_h, x0i:x1i]
    # composite: multiply ink onto the (noisy paper) background
    region = np.asarray(img.crop((x, y, x + t.shape[1], y + t.shape[0])))
    if region.shape[:2] != t.shape:  # clipped at the page edge
        t = t[: region.shape[0], : region.shape[1]]
    ink = (t.astype(np.float32) / 255.0)[..., None]
    out = (region.astype(np.float32) * ink + 20.0 * (1 - ink)).astype(np.uint8)
    img.paste(Image.fromarray(out), (x, y))
    return (x, y, x + t.shape[1], y + t.shape[0])


GT_INK_MARGIN = 3  # px of whitespace an annotator leaves around the ink


def _ink_anchor_v(img, box, y_cursor, line_h):
    """Re-anchor a ground-truth box's VERTICAL extent on the visible ink.

    The legacy ("cursor") convention is (x, y, x+tw, y+line_h) — anchored
    on the draw cursor, so the gap between box top and ink top equals the
    typeface's unused ascent, which varies per font. A segmenter trained
    on that convention must infer hidden font metrics from glyph shapes
    and drops ~0.15 IoU on held-out typefaces (measured: every variant
    plateaued at ~0.80 there, with per-edge deltas of 2-4 px on ~20 px
    boxes). Ink-anchored extents are directly observable from pixels —
    and match how the reference's real ground truth was produced in the
    first place: humans drawing LabelMe polygons around visible text
    (rescue_masks_from_json_final.py reads those polygons).
    """
    x1, _, x2, _ = box
    w, h = img.size
    ry1 = max(0, y_cursor - 6)
    ry2 = min(h, y_cursor + line_h + 8)
    region = np.asarray(img.crop((x1, ry1, min(x2, w), ry2)).convert("L"))
    ys = np.where((region < 128).any(axis=1))[0]
    if len(ys) == 0:  # degenerate: keep the cursor band
        return box
    ny1 = max(0, ry1 + int(ys.min()) - GT_INK_MARGIN)
    ny2 = min(h, ry1 + int(ys.max()) + 1 + GT_INK_MARGIN)
    return (x1, ny1, x2, ny2)


def render_invoice(
    invoice_no: str = "AB12345678",
    date_iso: str = "2025-09-09",
    amount: int = 120,
    items: Optional[List[dict]] = None,
    size: Tuple[int, int] = (440, 640),
    seed: int = 0,
    font_path: Optional[str] = None,
    font_size: int = 22,
    layout_jitter: float = 0.0,
    stylize: float = 0.0,
    gt_anchor: str = "ink",
    dot_print: bool = False,
):
    """Returns (PIL.Image RGB, field→(x1,y1,x2,y2) ground-truth boxes).

    ``font_path``/``font_size`` select the value-text typeface (default:
    DejaVuSansMono 22 — the round-1 behavior). ``layout_jitter`` ∈ [0,1]
    randomizes field positions/ordering so segmenters must find text, not
    memorize coordinates. ``stylize`` ∈ [0,1] warps each field's value
    text through a random typography transform (weight via morphology,
    slant shear, aspect stretch, letter tracking) — synthetic font-space
    mixing so models read layout/ink rather than one font's glyph shapes
    (VERDICT r2 #3); 0 keeps the exact legacy rendering.

    ``dot_print``: re-print all drawn text through the dot-matrix
    printhead simulation (ocr.jaxocr.data.dot_matrix) — the physical TW
    paper-invoice medium; QR codes are pasted after, staying crisp, so
    the knob isolates the OCR/segmentation print-medium axis.

    ``gt_anchor``: "ink" (default) anchors each box's vertical extent on
    the rendered ink ± GT_INK_MARGIN — observable from pixels, font-
    invariant, and faithful to how the reference's LabelMe ground truth
    was drawn by humans; "cursor" keeps the legacy (x, y, x+tw, y+line_h)
    band whose top margin encodes per-font hidden metrics (see
    _ink_anchor_v's rationale).
    """
    from PIL import Image, ImageDraw

    from twinvoice_tpu.qr.encode import render_qr

    if items is None:
        items = [{"name": "синt", "qty": 1, "price": amount}]
    from PIL import ImageFont

    w, h = size
    rng = np.random.default_rng(seed)
    bg = np.full((h, w, 3), 245, np.uint8)
    bg += rng.integers(0, 8, bg.shape, dtype=np.uint8)  # paper noise
    img = Image.fromarray(bg)
    draw = ImageDraw.Draw(img)

    boxes: Dict[str, Tuple[int, int, int, int]] = {}
    font = ImageFont.truetype(
        font_path or _os.path.join(_DEJAVU, "DejaVuSansMono.ttf"), font_size
    )
    line_h = int(font_size * 1.2)

    def value_line(label_text, value_text, x, y):
        """CJK label in the small default font (cosmetic), latin/digit VALUE
        in a print-quality font — the ground-truth box covers the value."""
        draw.text((x - 90, y + 6), label_text, fill=(20, 20, 20))
        if stylize > 0:
            box = _draw_stylized_value(img, value_text, font, (x, y),
                                       line_h, rng, float(stylize))
        else:
            draw.text((x, y), value_text, fill=(20, 20, 20), font=font)
            tw = draw.textlength(value_text, font=font)
            box = (x, y, int(x + tw), y + line_h)
        if gt_anchor == "ink":
            box = _ink_anchor_v(img, box, y, line_h)
        return box

    j = float(np.clip(layout_jitter, 0.0, 1.0))
    x0 = 120 + int(rng.integers(-30, 60) * j)
    y0 = 55 + int(rng.integers(-20, 80) * j)
    gap = 40 + int(rng.integers(-8, 30) * j)
    order = ["invoice_no", "date", "total_amount"]
    if j > 0 and rng.uniform() < 0.5 * j:
        rng.shuffle(order)
    texts = {
        "invoice_no": ("發票號碼", f"{invoice_no[:2]}-{invoice_no[2:]}"),
        "date": ("日期", date_iso),
        "total_amount": ("總計", str(amount)),
    }
    draw.text((150, 20), "電子發票證明聯", fill=(10, 10, 10))
    for i, field in enumerate(order):
        label, value = texts[field]
        boxes[field] = value_line(label, value, x0, y0 + i * gap)

    if dot_print:
        from twinvoice_tpu.ocr.jaxocr.data import dot_matrix

        gray = np.asarray(img.convert("L"), np.float32)
        # pitch=2: this renderer's value glyphs are 13-19 px cap height
        # (font_size 18-27), so 2 px pitch = 6.5-9.5 dots/glyph — the
        # 9-pin draft printhead regime. The pre-r5 unpinned pitch drew
        # 3 px dots on the same glyphs half the time (4-6 gapped
        # dots/glyph): a printer that does not physically exist, and
        # visibly beyond human legibility (see dot_matrix's calibration
        # note in ocr/jaxocr/data.py).
        dotted = dot_matrix(gray, rng, pitch=2).astype(np.uint8)
        img = Image.fromarray(np.stack([dotted] * 3, axis=-1))
        draw = ImageDraw.Draw(img)

    qr1 = render_qr(header_qr_payload(invoice_no, date_iso, amount), module_px=4)
    qr2 = render_qr(items_qr_payload(items), module_px=4)
    q1 = Image.fromarray(qr1).convert("RGB")
    q2 = Image.fromarray(qr2).convert("RGB")
    img.paste(q1, (20, h - q1.size[1] - 20))
    img.paste(q2, (w - q2.size[0] - 20, h - q2.size[1] - 20))

    return img, boxes


def labelme_shapes(boxes: Dict[str, Tuple[int, int, int, int]]) -> List[dict]:
    """Ground-truth boxes → labelme polygon shapes (for the data builder)."""
    shapes = []
    for label, (x1, y1, x2, y2) in boxes.items():
        shapes.append(
            {"label": label, "points": [[x1, y1], [x2, y1], [x2, y2], [x1, y2]]}
        )
    return shapes
