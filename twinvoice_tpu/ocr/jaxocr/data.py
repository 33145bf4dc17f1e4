"""Synthetic text-line generator for training/evaluating the recognizer.

Renders invoice-field-like strings (invoice numbers, dates, amounts, mixed
alphanumerics) with the DejaVu font family at varied sizes, then applies
camera-ish augmentations: contrast/brightness jitter, slight rotation,
gaussian noise, blur, polarity inversion and random padding. Everything is
derived from a numpy Generator so batches are reproducible.
"""

from __future__ import annotations

import glob
from functools import lru_cache
from typing import List, Optional

import numpy as np

from twinvoice_tpu.ocr.jaxocr.charset import CHARSET, Charset, DEFAULT, encode_text
from twinvoice_tpu.ocr.jaxocr.model import IMG_H, IMG_W

MAX_LABEL = 24

def _font_paths():
    """Training typefaces: the widened registry (data.synthetic.train_fonts,
    VERDICT r2 #3) — never the gauntlet's held-out families."""
    try:
        from twinvoice_tpu.data.synthetic import train_fonts

        out = train_fonts()
        if out:
            return out
    except Exception:
        pass
    return sorted(glob.glob("/usr/share/fonts/truetype/dejavu/*.ttf"))


_FONT_PATHS = _font_paths()

# Realistic TW receipt item names / labels, drawn from the classifier keyword
# vocabulary (fusion/classify.py) and common e-invoice text — all covered by
# the in-repo stroke font. Random glyph combos are mixed in so the model
# can't memorize this list.
_CJK_NAMES = (
    "珍珠奶茶 紅茶拿鐵 火腿吐司 雞排 鍋燒麵 咖啡 拿鐵 漢堡 壽司 炸雞 "
    "便當 飲料 餐飲 加油 停車費 捷運 高鐵 火車 公車 計程車 水費 電費 "
    "瓦斯 管理費 醫院 藥局 全家 蝦皮 商城 家樂福 發票 號碼 日期 總計 "
    "金額 統一編號 品名 數量 單價 合計 測試品項 電子發票證明聯 未分類 "
    "購物 生活 交通 美式咖啡 燒餅 油條 豆漿 麵包 餅乾 奶茶 紅豆餅"
).split()


def _cjk_pool(charset: Charset):
    return [c for c in charset.chars if ord(c) > 0x2E00]


def random_cjk_text(rng: np.random.Generator, charset: Charset) -> str:
    """Item-name-shaped CJK (optionally mixed with qty/price digits)."""
    kind = rng.integers(0, 4)
    if kind <= 1:  # realistic vocabulary name
        name = _CJK_NAMES[int(rng.integers(0, len(_CJK_NAMES)))]
        name = "".join(c for c in name if c in charset._to_id) or "品項"
    else:  # random combo — forces per-glyph recognition
        pool = _cjk_pool(charset)
        name = "".join(rng.choice(pool, int(rng.integers(2, 5))))
    if kind == 3 and rng.random() < 0.7:  # "name qty price"-ish line
        return f"{name} {rng.integers(1, 9)} {rng.integers(10, 999)}"
    return name


@lru_cache(maxsize=64)
def _font(path, size):
    from PIL import ImageFont

    return ImageFont.truetype(path, size)


def random_hard_text(rng: np.random.Generator, charset: Charset = DEFAULT) -> str:
    """Training-only hard-case sampler (r4 error analysis on the v5 weights):
    the residual misses concentrate in (a) O/0/I/1 confusions in *format-free*
    generic strings — the format-constrained engine decode can't rescue those,
    (b) space handling next to symbols (spurious/dropped ' '), (c) CTC
    doubled-character drops ('JJ-'→'J-'), and (d) random CJK glyph combos
    mixed with digits (per-glyph reading without vocabulary support). Eval
    never uses this sampler, so reported accuracy stays on the unchanged
    distribution."""
    has_cjk = len(charset.chars) > len(CHARSET)
    kind = rng.integers(0, 4 if has_cjk else 3)
    if kind == 0:  # O/0/I/1/S/5-dense format-free string
        pool = list("O0I1S5B8Z2Q") + list("O0O0I1")  # double-weight O/0/I/1
        n = int(rng.integers(4, 12))
        s = "".join(rng.choice(pool, n))
        if rng.random() < 0.4:  # sprinkle separators the confusions ride on
            i = int(rng.integers(1, max(2, n - 1)))
            s = s[:i] + str(rng.choice([".", ",", ":", "-", ")"])) + s[i:]
        return s
    if kind == 1:  # space-dense line with symbols at the boundaries
        words = []
        for _ in range(int(rng.integers(2, 4))):
            n = int(rng.integers(1, 6))
            words.append("".join(rng.choice(list(CHARSET.strip()), n)))
        return " ".join(words)[:MAX_LABEL - 1]
    if kind == 2:  # doubled-character runs (CTC must emit blanks)
        letters = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
        ch = str(rng.choice(list(letters + "0123456789")))
        tail = "".join(rng.choice(list("0123456789"), int(rng.integers(4, 9))))
        if rng.random() < 0.5:
            return ch * 2 + "-" + tail
        return ch * 2 + tail
    # random CJK combo + qty/price (the mixed-line failure mode)
    pool = _cjk_pool(charset)
    name = "".join(rng.choice(pool, int(rng.integers(2, 5))))
    return f"{name} {rng.integers(1, 9)} {rng.integers(10, 999)}"


def random_mixed_text(rng: np.random.Generator, charset: Charset = DEFAULT) -> str:
    """Training-only mixed-script line sampler (VERDICT r4 #2: mixed-script
    exact 0.804 is the weakest eval row real receipts exercise on every
    item line, reference app_camera.py:122-161). Emphasizes the
    script-boundary shapes the v8 error rows concentrate on: CJK name ↔
    digit qty/price transitions, ASCII words embedded in CJK labels, and
    unit suffixes. Never used by eval (the reported mixed row keeps the
    unchanged random_field_text distribution)."""
    pool = _cjk_pool(charset)
    if not pool:
        return random_field_text(rng, charset)
    kind = rng.integers(0, 5)
    if kind == 0:  # vocabulary name + qty + price (the canonical item line)
        name = _CJK_NAMES[int(rng.integers(0, len(_CJK_NAMES)))]
        name = "".join(c for c in name if c in charset._to_id) or "品項"
        return f"{name} {rng.integers(1, 99)} {rng.integers(10, 9999)}"
    if kind == 1:  # random glyph combo + digits, no separators (dense boundary)
        name = "".join(rng.choice(pool, int(rng.integers(2, 5))))
        return f"{name}{rng.integers(10, 999)}"
    if kind == 2:  # ASCII token inside a CJK label ("全家COFFEE拿鐵")
        a = "".join(rng.choice(pool, int(rng.integers(1, 3))))
        word = "".join(rng.choice(list("ABCDEFGHIJKLMNOPQRSTUVWXYZ"),
                                  int(rng.integers(2, 6))))
        b = "".join(rng.choice(pool, int(rng.integers(1, 3))))
        return f"{a}{word}{b}"
    if kind == 3:  # label: value ("金額: 1,250" / "數量:3")
        label = "".join(rng.choice(pool, int(rng.integers(2, 4))))
        amount = int(10 ** rng.uniform(0.5, 4))
        s = f"{amount:,}" if rng.random() < 0.3 else str(amount)
        sep = str(rng.choice([": ", ":", " "]))
        return f"{label}{sep}{s}"
    # name x qty ("珍珠奶茶 X2" / "咖啡*3")
    name = "".join(rng.choice(pool, int(rng.integers(2, 5))))
    return f"{name} {rng.choice(['X', '*', 'x'])}{rng.integers(1, 9)}"


def random_field_text(rng: np.random.Generator, charset: Charset = DEFAULT) -> str:
    """Sample a string shaped like one of the three invoice fields (or, when
    the charset covers CJK, like an item-name line ~35% of the time)."""
    if len(charset.chars) > len(CHARSET) and rng.random() < 0.35:
        return random_cjk_text(rng, charset)
    kind = rng.integers(0, 6)
    letters = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
    if kind in (0, 5):  # invoice number, possibly hyphenated (oversampled)
        # confusion-pair-weighted sampling (r4 error analysis): the misses
        # concentrate on O/0, S/5/6, B/8/V, I/1/J/L and on doubled digits
        # (CTC must emit a blank between repeats) — oversample both so the
        # model sees the hard cases far more often than uniform sampling
        # would produce.
        if rng.random() < 0.45:
            hard = "OSBIJLVQDGUZ"
            pre = "".join(rng.choice(list(hard), 2))
        else:
            pre = "".join(rng.choice(list(letters), 2))
        digits = list(rng.choice(list("0123456789"), 8))
        if rng.random() < 0.35:  # force a doubled digit pair
            i = int(rng.integers(0, 7))
            digits[i + 1] = digits[i]
        if rng.random() < 0.3:  # bias toward the confusable digits
            for i in range(8):
                if rng.random() < 0.4:
                    digits[i] = str(rng.choice(list("0156889")))
        no = pre + "".join(digits)
        return no if rng.random() < 0.5 else no[:2] + "-" + no[2:]
    if kind == 1:  # western date
        sep = rng.choice(["-", "/", "."])
        return f"{rng.integers(2018, 2031)}{sep}{rng.integers(1, 13):02d}{sep}{rng.integers(1, 29):02d}"
    if kind == 2:  # ROC-style date digits
        return f"{rng.integers(100, 130)}/{rng.integers(1, 13):02d}/{rng.integers(1, 29):02d}"
    if kind == 3:  # amount
        amount = int(10 ** rng.uniform(0.5, 5))
        s = f"{amount:,}" if rng.random() < 0.4 else str(amount)
        prefix = rng.choice(["", "$", "NT$", "TX ", "TOTAL "])
        return f"{prefix}{s}"
    n = int(rng.integers(3, 14))  # generic alphanumeric
    return "".join(rng.choice(list(CHARSET.strip() + "  "), n)).strip() or "X"


def dot_matrix(img: np.ndarray, rng: np.random.Generator,
               pitch: Optional[int] = None) -> np.ndarray:
    """Re-print a rendered line through a simulated dot-matrix/thermal
    printhead: ink is grid-sampled at ``pitch`` px and re-drawn as
    discrete dots with per-dot intensity jitter and row banding.

    Physical TW paper invoices (the duplicate uniform invoice the
    reference app photographs) are dot-matrix printed; EasyOCR's
    pretrained envelope covers that medium implicitly
    (reference app_camera.py:73). Training on this transform gives
    jaxocr the same coverage without any printed-sample data.

    Physical calibration (r5): a printer's dot count per character is
    printhead-FIXED — a 9-pin head prints ~7-9 dots per cap height in
    draft (adjacent wires touching), NLQ double-pass and 203 dpi thermal
    heads ~14-24 — and the head also sets the MINIMUM character size, so
    sub-~6.5 dots-per-glyph renders model a printer that does not exist.
    Callers therefore pick ``pitch`` from their glyph height: pass
    ``pitch=2`` for glyphs under ~21 px (render_invoice's 13-19 px cap
    heights → 6.5-9.5 dots/glyph, the 9-pin draft regime); the default
    (pitch 2 or 3 at this module's 28 px canvas glyphs) spans 9-14
    dots/glyph. Uncalibrated pitch-3 dots on 13 px glyphs (4-6 gapped
    dots/glyph) rendered the pre-r5 e2e dot tier beyond-physical — and
    visibly beyond HUMAN legibility (docs/STATUS_R5.md).
    """
    H, W = img.shape
    pitch = int(rng.integers(2, 4)) if pitch is None else int(pitch)
    ink = 255.0 - img
    gh, gw = H // pitch, W // pitch
    cells = ink[: gh * pitch, : gw * pitch].reshape(
        gh, pitch, gw, pitch).mean(axis=(1, 3))
    dots = cells > float(rng.uniform(40, 80))
    # round dot kernel, slight over-size for ink bleed
    yy, xx = np.mgrid[0:pitch, 0:pitch].astype(np.float32)
    c = (pitch - 1) / 2.0
    kern = (((yy - c) ** 2 + (xx - c) ** 2)
            <= (pitch / 2.0 + 0.15) ** 2).astype(np.float32)
    # per-dot intensity jitter (worn ribbon / uneven thermal head)
    amp = dots * rng.uniform(0.55, 1.0, dots.shape)
    # row banding: every printhead pass leaves a slightly lighter row
    amp *= (1.0 - 0.25 * (rng.random(gh) < 0.2))[:, None]
    printed = np.kron(amp, kern) * float(rng.uniform(190, 255))
    out = np.full((H, W), 255.0, np.float32)
    out[: gh * pitch, : gw * pitch] -= printed
    return np.clip(out, 0, 255)


def render_line(text: str, rng: np.random.Generator,
                sev: float = 1.0, dot: bool = False,
                synth_style=None, dot_hard: bool = False) -> np.ndarray:
    """Render text → uint8 grayscale (IMG_H, IMG_W), dark text on light bg.

    ``sev`` scales the degradation knobs (probabilities and amplitudes of
    rotation, elastic warp and the photometric block). 1.0 is the
    canonical train/eval distribution — eval callers never pass anything
    else, so reported accuracies don't drift. Training passes >1.0 for a
    fraction of samples (severity curriculum, mirroring the segmenter's
    sev-0.8 retrain that lifted its hard tier 0.83→0.92): the v6 error
    ablation pinned ~8 exact-match points on the photometric block alone.

    ``synth_style``: a fonts.latin_glyphs.LatinStyle — render the (ASCII)
    line in that synthetic parametric typeface instead of a TTF. Training
    only (the typeface-generalization curriculum, r5): eval callers never
    pass it, so the held-out-font tiers keep measuring real unseen TTFs.
    """
    from PIL import Image, ImageDraw

    size = int(rng.integers(18, 30))
    font = _font(_FONT_PATHS[int(rng.integers(0, len(_FONT_PATHS)))], size)
    pad = 8
    canvas = Image.new("L", (IMG_W * 2 + 64 * len(text), IMG_H * 2), 255)
    draw = ImageDraw.Draw(canvas)
    fill = int(rng.integers(0, 80))
    if any(ord(c) > 0x2E00 for c in text):
        # CJK (or mixed) line: stroke-font glyphs + PIL font for ASCII
        from twinvoice_tpu.ocr import fonts

        fonts.draw_text(
            draw, (pad, pad), text, size, fill=fill, ascii_font=font,
            weight=float(rng.uniform(5.0, 8.0)),
            # style randomization: CJK shape classes, not one rendering
            # (70% of renders jittered; the rest canonical)
            style_rng=rng if rng.random() < 0.7 else None,
            jitter=float(rng.uniform(0.015, 0.05)),
        )
    elif synth_style is not None:
        from twinvoice_tpu.ocr.fonts import latin_glyphs

        latin_glyphs.draw_text(draw, (pad, pad), text, size, fill=fill,
                               style=synth_style)
    elif rng.random() < 0.5:
        # per-char rendering with tracking + baseline jitter (r4): the
        # held-out-font e2e misses are single-glyph shape confusions
        # (A→N, M→W, J→I...) — spacing/baseline variety pushes the model
        # toward glyph shape classes instead of one metric layout
        x = float(pad)
        for ch in text:
            dy = float(rng.normal(0, 1.0)) * size / 24.0
            draw.text((x, pad + dy), ch, fill=fill, font=font)
            adv = draw.textlength(ch, font=font)
            x += adv * float(rng.uniform(0.92, 1.18))
    else:
        draw.text((pad, pad), text, fill=fill, font=font)
    arr = np.asarray(canvas)
    ys, xs = np.where(arr < 250)
    if len(xs) == 0:
        return np.full((IMG_H, IMG_W), 255, np.uint8)
    x0, x1 = xs.min(), xs.max() + 1
    y0, y1 = ys.min(), ys.max() + 1
    crop = Image.fromarray(arr[y0:y1, x0:x1])

    if rng.random() < min(0.85, 0.4 * sev):
        crop = crop.rotate(float(rng.uniform(-4.0 * sev, 4.0 * sev)),
                           expand=True, fillcolor=255)

    if rng.random() < 0.5:
        # typography warp (VERDICT r2 #3): weight via morphology + slant
        # shear — the recognizer must read glyph structure, not one font's
        # exact shapes
        import cv2

        t = np.asarray(crop)
        r = rng.random()
        if r < 0.3:
            t = cv2.erode(t, np.ones((2, 2), np.uint8))    # bolder ink
        elif r < 0.5:
            t = cv2.dilate(t, np.ones((2, 2), np.uint8))   # lighter ink
        shear = float(rng.uniform(-0.25, 0.25))
        h0, w0 = t.shape
        m = np.array([[1.0, shear, abs(shear) * h0], [0.0, 1.0, 0.0]],
                     np.float32)
        t = cv2.warpAffine(t, m, (int(w0 + abs(shear) * h0 + 2), h0),
                           flags=cv2.INTER_LINEAR,
                           borderMode=cv2.BORDER_CONSTANT, borderValue=255)
        crop = Image.fromarray(t)

    # fit into target while keeping aspect (± slight x-stretch, simulating
    # the aspect distortion bbox scale-back introduces); random placement
    w, h = crop.size
    scale = min((IMG_H - 4) / h, (IMG_W - 4) / w)
    stretch = float(rng.uniform(0.85, 1.15))
    new_w = max(1, min(IMG_W - 4, int(w * scale * stretch)))
    crop = crop.resize((new_w, max(1, int(h * scale))))
    out = Image.new("L", (IMG_W, IMG_H), 255)
    max_x = IMG_W - crop.size[0]
    ox = int(rng.integers(0, max(1, max_x // 3)))
    oy = (IMG_H - crop.size[1]) // 2
    out.paste(crop, (ox, oy))
    img = np.asarray(out, np.float32)

    if dot:
        # Glyph-relative dot-scale randomization (r5). The printhead pitch
        # is fixed in PAPER pixels, not glyph pixels: e2e invoices
        # (data/synthetic.py render_invoice, font_size 18-27 → glyph
        # 13-20 px) carry fewer dots per glyph than this ~28 px canvas.
        # Measured consequence of training at canvas scale only: v8 reads
        # GT dot-print field crops at 0.24-0.44 exact
        # (scripts/diag_dot_e2e.py) while its same-scale line eval says
        # 0.70. Dotting at a random downscale and resizing back with the
        # same interpolation the serving prepare_crop uses (INTER_LINEAR
        # upscale, engine.py) covers the physical pitch-to-glyph range —
        # bounded below at ~6.5 dots per glyph height, the 9-pin draft
        # floor (see dot_matrix's physical calibration note): with glyphs
        # at 28*s px, dots/glyph = 28*s/pitch, so s_min = 6.5*pitch/28.
        import cv2

        pitch = int(rng.integers(2, 4))
        if dot_hard:
            # training-only emphasis (``dot_hard_frac``): sample dots-per-
            # glyph directly in the 9-pin DRAFT band (6.5-9.5 dots/glyph)
            # — the physical regime the e2e invoices render (pitch 2,
            # glyph 13-20 px) and where the v12 per-scale sweep shows the
            # accuracy collapse. Eval callers never pass it, so the
            # reported --dot tier distribution is unchanged.
            dpg = float(rng.uniform(6.5, 9.5))
            s = min(1.0, dpg * pitch / 28.0)
        else:
            s = float(rng.uniform(min(1.0, 6.5 * pitch / 28.0), 1.0))
        if s < 0.97:
            sw, sh = max(8, int(IMG_W * s)), max(8, int(IMG_H * s))
            small = cv2.resize(img, (sw, sh), interpolation=cv2.INTER_AREA)
            img = cv2.resize(dot_matrix(small, rng, pitch=pitch),
                             (IMG_W, IMG_H),
                             interpolation=cv2.INTER_LINEAR)
        else:
            img = dot_matrix(img, rng, pitch=pitch)

    if rng.random() < min(0.85, 0.4 * sev):
        # low-frequency elastic warp (r4): smooth ±1px displacement field
        # — glyph-shape perturbation that generalizes across typeface
        # skeletons (serif/sans stroke-shape differences)
        import cv2

        amp = float(rng.uniform(0.5, max(0.51, 1.3 * sev)))
        gx = cv2.resize(rng.normal(0, amp, (4, 16)).astype(np.float32),
                        (IMG_W, IMG_H), interpolation=cv2.INTER_CUBIC)
        gy = cv2.resize(rng.normal(0, 0.8 * amp, (4, 16)).astype(np.float32),
                        (IMG_W, IMG_H), interpolation=cv2.INTER_CUBIC)
        xs, ys = np.meshgrid(np.arange(IMG_W, dtype=np.float32),
                             np.arange(IMG_H, dtype=np.float32))
        img = cv2.remap(img, xs + gx, ys + gy, cv2.INTER_LINEAR,
                        borderMode=cv2.BORDER_REPLICATE)

    # photometric augmentation incl. paper texture (matches receipt scans)
    img = img * float(rng.uniform(max(0.45, 1.0 - 0.3 * sev), 1.0)) \
        + float(rng.uniform(0, 60 * sev))
    if rng.random() < min(0.85, 0.5 * sev):
        img = img + rng.normal(0, rng.uniform(2, 12 * sev), img.shape)
    if rng.random() < 0.5:
        img = img - rng.integers(0, 9, img.shape)  # paper grain
    if rng.random() < min(0.7, 0.3 * sev):  # cheap 2x2 box blur
        img = (img + np.roll(img, 1, 0) + np.roll(img, 1, 1) + np.roll(np.roll(img, 1, 0), 1, 1)) / 4
    return np.clip(img, 0, 255).astype(np.uint8)


def make_batch(batch_size: int, rng: np.random.Generator,
               charset: Charset = DEFAULT, hard_frac: float = 0.0,
               sev_frac: float = 0.0, sev_hi: float = 1.8,
               dot_frac: float = 0.0, mixed_frac: float = 0.0,
               synth_frac: float = 0.0, dot_hard_frac: float = 0.0):
    """→ (images (B,H,W,1) float[0,1], labels (B,MAX) int32, label_pad (B,MAX) f32, texts).

    ``hard_frac`` > 0 draws that fraction of samples from
    :func:`random_hard_text` (training only — eval callers leave it 0 so the
    reported accuracy distribution never drifts). ``sev_frac`` > 0 renders
    that fraction at an amplified degradation severity drawn from
    U(1.2, ``sev_hi``) — the recognizer severity curriculum (training
    only, same discipline). ``dot_frac`` renders that fraction through the
    :func:`dot_matrix` printhead simulation — the physical TW invoice
    print medium (training + the dedicated dot-matrix eval tier).
    ``dot_hard_frac`` renders that fraction OF the dot samples in the
    9-pin draft band (6.5-9.5 dots/glyph — the e2e physical regime;
    training only). ``mixed_frac`` draws that fraction from :func:`random_mixed_text`
    (training only — the mixed-script curriculum). ``synth_frac`` renders
    that fraction of ASCII lines in a random synthetic parametric typeface
    (fonts.latin_glyphs — the typeface-generalization curriculum,
    training only)."""
    imgs = np.zeros((batch_size, IMG_H, IMG_W, 1), np.float32)
    labels = np.zeros((batch_size, MAX_LABEL), np.int32)
    pad = np.ones((batch_size, MAX_LABEL), np.float32)
    texts: List[str] = []
    for i in range(batch_size):
        if hard_frac > 0.0 and rng.random() < hard_frac:
            text = random_hard_text(rng, charset)
        elif mixed_frac > 0.0 and rng.random() < mixed_frac:
            text = random_mixed_text(rng, charset)
        else:
            text = random_field_text(rng, charset)
        ids = charset.encode_text(text)[:MAX_LABEL]
        text = "".join(
            c for c in text.upper() if charset.encode_text(c)
        )[: len(ids)]  # keep label/text consistent
        sev = 1.0
        if sev_frac > 0.0 and rng.random() < sev_frac:
            sev = float(rng.uniform(1.2, sev_hi))
        dot = dot_frac > 0.0 and rng.random() < dot_frac
        dhard = dot and dot_hard_frac > 0.0 and rng.random() < dot_hard_frac
        style = None
        if (synth_frac > 0.0 and rng.random() < synth_frac
                and not any(ord(c) > 0x2E00 for c in text)):
            from twinvoice_tpu.ocr.fonts import latin_glyphs

            style = latin_glyphs.sample_style(rng)
        imgs[i, :, :, 0] = render_line(
            text, rng, sev=sev, dot=dot,
            synth_style=style, dot_hard=dhard).astype(np.float32) / 255.0
        labels[i, : len(ids)] = ids
        pad[i, : len(ids)] = 0.0
        texts.append(text)
    return imgs, labels, pad, texts
