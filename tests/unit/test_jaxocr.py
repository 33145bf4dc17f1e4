"""JAX OCR recognizer tests: charset, CTC decode, model mechanics, synthetic
data, engine adapter, and (when trained weights are present) accuracy."""

import os

import numpy as np
import pytest

from twinvoice_tpu.ocr.jaxocr.charset import (
    BLANK,
    NUM_CLASSES,
    decode_ids,
    encode_text,
    greedy_ctc_decode,
)


def test_charset_roundtrip():
    assert decode_ids(encode_text("AB12345678")) == "AB12345678"
    assert decode_ids(encode_text("nt$1,250")) == "NT$1,250"  # uppercased
    assert encode_text("年") == []  # out-of-charset dropped


def test_greedy_ctc_collapse():
    a = encode_text("A")[0]
    b = encode_text("B")[0]
    assert greedy_ctc_decode([BLANK, a, a, BLANK, a, b, b]) == "AAB"
    assert greedy_ctc_decode([BLANK] * 5) == ""


def test_model_shapes_and_train_step():
    import jax
    import jax.numpy as jnp
    import optax

    from twinvoice_tpu.ocr.jaxocr.model import TIME_STEPS, crnn_apply, init_crnn
    from twinvoice_tpu.ocr.jaxocr.train import make_train_step
    from twinvoice_tpu.ocr.jaxocr import data as D

    params, state = init_crnn(jax.random.key(0))
    imgs, labels, pad, _ = D.make_batch(2, np.random.default_rng(0))
    logits, new_state = crnn_apply(params, state, jnp.asarray(imgs))
    assert logits.shape == (2, TIME_STEPS, NUM_CLASSES)
    # all BN states updated in train mode
    _, ns = crnn_apply(params, state, jnp.asarray(imgs), train=True)
    assert len(ns["bn"]) == 4 and len(ns["ctx_bn"]) == 2
    before = np.asarray(state["bn"][0]["mean"])
    after = np.asarray(ns["bn"][0]["mean"])
    assert not np.allclose(before, after)

    opt = optax.adam(1e-3)
    step = make_train_step(opt)
    p, s, o, loss = step(params, state, opt.init(params),
                         jnp.asarray(imgs), jnp.asarray(labels), jnp.asarray(pad))
    assert np.isfinite(float(loss))


def test_synthetic_data_labels_match_text():
    from twinvoice_tpu.ocr.jaxocr import data as D

    imgs, labels, pad, texts = D.make_batch(8, np.random.default_rng(3))
    assert imgs.shape == (8, 32, 256, 1)
    assert imgs.min() >= 0 and imgs.max() <= 1
    for row, prow, text in zip(labels, pad, texts):
        n = int((prow == 0).sum())
        assert decode_ids(row[:n]) == text


def test_hard_sampler_batches_stay_well_formed():
    """hard_frac batches must keep the label/text invariant of the normal
    sampler (training-only distribution shift, same encoding contract)."""
    from twinvoice_tpu.ocr.jaxocr import data as D
    from twinvoice_tpu.ocr.jaxocr.charset import cjk_charset

    rng = np.random.default_rng(7)
    for cs in (None, cjk_charset()):
        kw = {"charset": cs} if cs is not None else {}
        imgs, labels, pad, texts = D.make_batch(16, rng, hard_frac=1.0, **kw)
        assert imgs.shape == (16, 32, 256, 1)
        for row, prow, text in zip(labels, pad, texts):
            n = int((prow == 0).sum())
            assert 0 < n <= D.MAX_LABEL
            got = (cs.decode_ids(row[:n]) if cs is not None
                   else decode_ids(row[:n]))
            assert got == text


def test_weights_roundtrip(tmp_path):
    import jax

    from twinvoice_tpu.ocr.jaxocr.model import init_crnn
    from twinvoice_tpu.ocr.jaxocr.train import load_weights, save_weights

    params, state = init_crnn(jax.random.key(5))
    path = str(tmp_path / "w.npz")
    save_weights(path, params, state)
    p2, s2, cs = load_weights(path)
    assert cs.num_classes == len(cs.chars) + 1
    a = jax.tree.leaves(params)[0]
    b = jax.tree.leaves(p2)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_engine_unavailable_graceful(tmp_path):
    from twinvoice_tpu.ocr.jaxocr.engine import JaxOcrEngine

    eng = JaxOcrEngine(weights_dir=str(tmp_path / "missing.npz"))
    assert not eng.available()
    assert eng.read(np.zeros((10, 40, 3), np.uint8)).text == ""


def _weights_present():
    from twinvoice_tpu.ocr.jaxocr.train import DEFAULT_WEIGHTS_PATH

    return os.path.exists(DEFAULT_WEIGHTS_PATH)


@pytest.mark.skipif(not _weights_present(), reason="no trained weights")
def test_trained_engine_reads_synthetic_fields():
    from twinvoice_tpu.data.synthetic import render_invoice
    from twinvoice_tpu.ocr.jaxocr.engine import JaxOcrEngine

    eng = JaxOcrEngine()
    assert eng.available()
    img, boxes = render_invoice("AB12345678", "2025-09-09", 34567, seed=1)
    x1, y1, x2, y2 = boxes["total_amount"]
    got = eng.read(img.crop((x1 - 4, y1 - 4, x2 + 4, y2 + 4)), mode="amount").text
    digits = "".join(c for c in got if c.isdigit())
    assert digits == "34567"


@pytest.mark.skipif(not _weights_present(), reason="no trained weights")
def test_confidence_separates_clean_from_noise():
    from PIL import Image

    from twinvoice_tpu.data.synthetic import render_invoice
    from twinvoice_tpu.ocr.jaxocr.engine import JaxOcrEngine

    eng = JaxOcrEngine()
    img, boxes = render_invoice("AB12345678", "2025-09-09", 34567, seed=3)
    x1, y1, x2, y2 = boxes["total_amount"]
    clean = eng.read(img.crop((x1 - 4, y1 - 4, x2 + 4, y2 + 4)), mode="amount")
    assert clean.text == "34567"
    assert clean.confidence is not None and clean.confidence > 0.9

    noise = np.random.default_rng(1).integers(0, 255, (30, 120, 3), dtype=np.uint8)
    noisy = eng.read(Image.fromarray(noise))
    assert (noisy.confidence or 0) < clean.confidence


def test_cjk_charset_and_data():
    """CJK charset: every stroke-font glyph encodable; CJK batch renders ink
    and labels round-trip (VERDICT r1 #4)."""
    from twinvoice_tpu.ocr.jaxocr.charset import cjk_charset
    from twinvoice_tpu.ocr.jaxocr import data as D

    cs = cjk_charset()
    assert cs.num_classes > 300
    ids = cs.encode_text("珍珠奶茶 55")
    assert len(ids) == 7 and cs.decode_ids(ids) == "珍珠奶茶 55"

    rng = np.random.default_rng(0)
    imgs, labels, pad, texts = D.make_batch(8, rng, cs)
    assert any(any(ord(c) > 0x2E00 for c in t) for t in texts)
    assert (imgs < 0.5).any()  # ink present
    for i, t in enumerate(texts):
        n = int((pad[i] == 0).sum())
        assert cs.decode_ids(labels[i, :n]) == t


def test_cjk_weights_roundtrip(tmp_path):
    import jax

    from twinvoice_tpu.ocr.jaxocr.charset import cjk_charset
    from twinvoice_tpu.ocr.jaxocr.model import init_crnn
    from twinvoice_tpu.ocr.jaxocr.train import load_weights, save_weights

    cs = cjk_charset()
    params, state = init_crnn(jax.random.key(1), num_classes=cs.num_classes)
    path = str(tmp_path / "w.npz")
    save_weights(path, params, state, cs)
    p2, s2, cs2 = load_weights(path)
    assert cs2.chars == cs.chars


def test_prepare_crop_polarity_and_contrast():
    """Inverted-video and low-contrast crops normalize into the training
    distribution (dark ink, full-range background)."""
    from PIL import Image, ImageDraw, ImageFont

    from twinvoice_tpu.ocr.jaxocr.engine import prepare_crop

    font = ImageFont.truetype(
        "/usr/share/fonts/truetype/dejavu/DejaVuSansMono.ttf", 22
    )
    img = Image.new("L", (140, 36), 255)
    ImageDraw.Draw(img).text((4, 4), "AB-123", fill=0, font=font)
    base = prepare_crop(img)

    inverted = prepare_crop(Image.fromarray(255 - np.asarray(img)))
    lowc = prepare_crop(
        Image.fromarray((np.asarray(img) * 0.12 + 140).astype(np.uint8))
    )
    for variant in (inverted, lowc):
        assert variant is not None
        # normalized variants should closely match the clean preparation
        assert np.mean(np.abs(variant - base)) < 0.12
        assert variant.min() < 0.3 and variant.max() > 0.8  # full range, dark ink


def test_band_grouping_one_line_of_words_is_one_band():
    from twinvoice_tpu.ocr.jaxocr.engine import _group_into_bands

    # three word boxes on one line (y-overlapping), one on a second line
    one_line = [(5, 10, 60, 40), (70, 12, 120, 42), (130, 9, 200, 38)]
    assert len(_group_into_bands(one_line)) == 1
    two_lines = one_line + [(5, 60, 200, 90)]
    bands = _group_into_bands(two_lines)
    assert len(bands) == 2
    assert bands[0][1] < bands[1][1]  # top-to-bottom
    assert bands[0] == (5, 9, 200, 42)  # merged extents


def test_split_lines_tall_single_line_not_split():
    """ADVICE r2: a single-line crop taller than 2*IMG_H (high-res photo)
    must come back whole — widely spaced words must not be split into
    separate reads that get re-ordered."""
    from PIL import Image, ImageDraw, ImageFont

    from twinvoice_tpu.ocr.jaxocr.engine import JaxOcrEngine

    font = ImageFont.truetype(
        "/usr/share/fonts/truetype/dejavu/DejaVuSansMono.ttf", 64
    )
    img = Image.new("L", (900, 110), 255)
    ImageDraw.Draw(img).text((10, 15), "AB 1234 5678", fill=0, font=font)
    parts = JaxOcrEngine._split_lines(img)
    assert len(parts) == 1
    assert parts[0].shape == (110, 900)

    # and a genuinely two-line tall crop still splits
    img2 = Image.new("L", (900, 220), 255)
    d = ImageDraw.Draw(img2)
    d.text((10, 10), "AB-12345678", fill=0, font=font)
    d.text((10, 120), "2024/03/15", fill=0, font=font)
    parts2 = JaxOcrEngine._split_lines(img2)
    assert len(parts2) == 2


def test_t64_arch_shapes_and_roundtrip(tmp_path):
    """The t64 arch (height-only third pool) doubles CTC time frames with
    IDENTICAL parameter shapes; the arch tag survives a save/load."""
    import jax
    import jax.numpy as jnp

    from twinvoice_tpu.ocr.jaxocr.model import (
        TIME_STEPS_T64, crnn_apply, init_crnn)
    from twinvoice_tpu.ocr.jaxocr.train import load_weights_ex, save_weights

    params, state = init_crnn(jax.random.key(1))
    x = jnp.zeros((2, 32, 256, 1), jnp.float32)
    logits, _ = crnn_apply(params, state, x, arch="t64")
    assert logits.shape == (2, TIME_STEPS_T64, NUM_CLASSES)

    path = str(tmp_path / "w64.npz")
    save_weights(path, params, state, arch="t64")
    p2, s2, cs, arch = load_weights_ex(path)
    assert arch == "t64"
    # legacy 3-tuple loader still works on the same file
    from twinvoice_tpu.ocr.jaxocr.train import load_weights

    p3, s3, cs3 = load_weights(path)
    assert cs3.num_classes == cs.num_classes



def _with_topk(rows):
    """Expand stubbed (ids, conf) rows to the 5-tuple _infer contract.
    Top-k mirrors the greedy ids; blank gets a low logp everywhere so the
    constrained decoder sees the same reads the greedy path produced."""
    ids = np.asarray([r for r, _ in rows])
    conf = np.asarray([c for _, c in rows])
    B, T = ids.shape
    tk_ids = np.zeros((B, T, 8), np.int64)
    tk_lp = np.full((B, T, 8), -20.0, np.float32)
    tk_ids[:, :, 0] = ids
    tk_lp[:, :, 0] = -0.05
    blank = np.where(ids == 0, -0.05, -8.0).astype(np.float32)
    return ids, conf, tk_ids, tk_lp, blank


def test_amount_mode_multicrop_voting(monkeypatch):
    """Test-time voting: two agreeing digit-dominant variant reads outvote
    the base read; non-digit variant reads get no vote."""
    import numpy as np

    from twinvoice_tpu.ocr.jaxocr.engine import JaxOcrEngine

    eng = JaxOcrEngine()
    if not eng.available():
        import pytest

        pytest.skip("bundled recognizer weights missing")
    cs = eng.charset

    def encode(text, conf, n_rows_t=64):
        # interleave with blanks so greedy_ctc_decode returns `text`
        row = []
        for ch in text:
            row += [cs.chars.index(ch) + 1, 0]
        row += [0] * (n_rows_t - len(row))
        return row, conf

    img = np.full((40, 160), 255, np.uint8)
    img[10:30, 10:150] = 0  # some ink so _split_lines finds one line

    def fake_infer(p, s, x):
        rows = [encode("4580", 0.9), encode("4586", 0.55),
                encode("4586", 0.55)]
        assert x.shape[0] == 3  # base + 2 variants
        return _with_topk(rows)

    monkeypatch.setattr(eng, "_infer", fake_infer)
    r = eng.read_batch([img], modes=["amount"])[0]
    assert r.text == "4586"  # 2×0.55 outvotes 1×0.9

    def fake_infer2(p, s, x):
        rows = [encode("4580", 0.9), encode("XYZQ", 0.99),
                encode("XYZW", 0.99)]
        return _with_topk(rows)

    monkeypatch.setattr(eng, "_infer", fake_infer2)
    r = eng.read_batch([img], modes=["amount"])[0]
    assert r.text == "4580"  # non-digit reads don't vote


def _frames(charset, entries, K=3):
    """Build (tk_ids, tk_lp, blank_lp) from [(char_or_None, alts), ...]
    where alts = [(char, logp), ...]; None = blank-dominated frame."""
    tk_ids, tk_lp, blank = [], [], []
    for alts in entries:
        row_ids, row_lp = [], []
        for ch, lp in alts:
            cid = 0 if ch is None else charset._to_id[ch]
            row_ids.append(cid)
            row_lp.append(lp)
        while len(row_ids) < K:
            row_ids.append(row_ids[-1])
            row_lp.append(-20.0)
        tk_ids.append(row_ids[:K])
        tk_lp.append(row_lp[:K])
        blank.append(alts[0][1] if alts[0][0] is None else -8.0)
    return (np.asarray(tk_ids), np.asarray(tk_lp, np.float32),
            np.asarray(blank, np.float32))


def test_constrained_decode_fixes_letter_digit_confusion():
    from twinvoice_tpu.ocr.jaxocr.charset import (
        DEFAULT, INVOICE_PATTERN, constrained_ctc_decode)

    # 'A' frame where '4' narrowly wins greedy; letter slot forces 'A'
    entries = [[("4", -0.4), ("A", -1.2)]]
    for ch in "B12345678":
        entries.append([(ch, -0.05), (None, -4.0)])
        entries.append([(None, -0.05), (ch, -4.0)])  # blank separator
    tk_ids, tk_lp, blank = _frames(DEFAULT, entries)
    text, lp = constrained_ctc_decode(DEFAULT, tk_ids, tk_lp, blank,
                                      INVOICE_PATTERN)
    assert text == "AB12345678"
    # and the greedy read really was wrong
    greedy = DEFAULT.greedy_ctc_decode(tk_ids[:, 0])
    assert greedy.startswith("4")


def test_constrained_decode_optional_hyphen_and_reject():
    from twinvoice_tpu.ocr.jaxocr.charset import (
        DEFAULT, INVOICE_PATTERN, constrained_ctc_decode)

    entries = []
    for ch in "AB-12345678":
        entries.append([(ch, -0.05), (None, -4.0)])
        entries.append([(None, -0.05), (ch, -4.0)])
    tk_ids, tk_lp, blank = _frames(DEFAULT, entries)
    text, _ = constrained_ctc_decode(DEFAULT, tk_ids, tk_lp, blank,
                                     INVOICE_PATTERN)
    assert text == "AB-12345678"

    # a crop with no letter/digit mass anywhere → no valid path
    entries = [[(":", -0.1), ("$", -1.0)]] * 6
    tk_ids, tk_lp, blank = _frames(DEFAULT, entries)
    text, lp = constrained_ctc_decode(DEFAULT, tk_ids, tk_lp, blank,
                                      INVOICE_PATTERN)
    assert text is None


def test_constrained_decode_repeated_digits():
    """CTC repeat rule: '11' needs a blank between emissions; the automaton
    must still accept doubled digits."""
    from twinvoice_tpu.ocr.jaxocr.charset import (
        DEFAULT, INVOICE_PATTERN, constrained_ctc_decode)

    entries = []
    for ch in "XY11223344":
        entries.append([(ch, -0.05), (None, -4.0)])
        entries.append([(None, -0.05), (ch, -4.0)])
    tk_ids, tk_lp, blank = _frames(DEFAULT, entries)
    text, _ = constrained_ctc_decode(DEFAULT, tk_ids, tk_lp, blank,
                                     INVOICE_PATTERN)
    assert text == "XY11223344"


# ------------------------------------------------------- beam search + LM


def test_beam_decode_sums_path_mass():
    """Greedy follows per-frame argmax (blank twice → ''); prefix beam
    search sums over all frame paths that collapse to 'A' (A·A, A·-, -·A
    = 0.36 > 0.2025 for '') and must recover it."""
    import math

    from twinvoice_tpu.ocr.jaxocr.charset import DEFAULT, beam_ctc_decode

    frame = [(None, math.log(0.45)), ("A", math.log(0.30)),
             ("B", math.log(0.25))]
    tk_ids, tk_lp, blank = _frames(DEFAULT, [frame, frame])
    assert DEFAULT.greedy_ctc_decode(tk_ids[:, 0]) == ""
    text, _ = beam_ctc_decode(DEFAULT, tk_ids, tk_lp, blank)
    assert text == "A"


def test_beam_lm_fixes_zero_oh_in_digit_context():
    """A frame where 'O' narrowly beats '0' after seven digits: the
    acoustic beam keeps 'O', LM fusion (invoice-number prior) flips it."""
    from twinvoice_tpu.ocr.jaxocr.charset import DEFAULT, beam_ctc_decode
    from twinvoice_tpu.ocr.jaxocr.lm import default_lm

    entries = []
    for ch in "UB55328":
        entries.append([(ch, -0.05), (None, -4.0)])
        entries.append([(None, -0.05), (ch, -4.0)])
    entries.append([("O", -0.60), ("0", -0.86)])  # the ambiguous frame
    entries.append([(None, -0.05), ("O", -4.0)])
    for ch in "77":
        entries.append([(ch, -0.05), (None, -4.0)])
        entries.append([(None, -0.05), (ch, -4.0)])
    tk_ids, tk_lp, blank = _frames(DEFAULT, entries)

    plain, _ = beam_ctc_decode(DEFAULT, tk_ids, tk_lp, blank)
    assert plain == "UB55328O77"
    fused, _ = beam_ctc_decode(DEFAULT, tk_ids, tk_lp, blank,
                               lm=default_lm())
    assert fused == "UB55328077"


def test_lm_asset_loads_and_is_domain_shaped():
    import math

    from twinvoice_tpu.ocr.jaxocr.lm import default_lm

    lm = default_lm()
    # probabilities are valid and the domain structure is in there
    assert math.exp(lm.logp("^AB1", "2")) < 1.0
    # after '珍珠奶' the item vocabulary overwhelmingly continues with '茶'
    assert lm.logp("珍珠奶", "茶") > lm.logp("珍珠奶", "K") + 2.0
    # a digit is far more likely than a letter deep in an invoice number
    assert lm.logp("^UB55328", "0") > lm.logp("^UB55328", "O") + 1.0


def test_engine_beam_lm_decode_reads_fields():
    from twinvoice_tpu.ocr.jaxocr import data as D
    from twinvoice_tpu.ocr.jaxocr.engine import JaxOcrEngine

    eng = JaxOcrEngine(decode="beam_lm")
    if not eng.available():
        pytest.skip("no trained weights bundled")
    rng = np.random.default_rng(0)  # a light-degradation draw sequence
    for want in ["AB12345678", "2026/08/12"]:
        img = D.render_line(want, rng)
        got = eng.read(img).text
        assert got == want


def test_dot_matrix_render_tier():
    """The printhead simulation keeps shape/range, quantizes ink into a
    dot grid, and is train-only plumbing (eval callers never pass it)."""
    from twinvoice_tpu.ocr.jaxocr import data as D

    rng = np.random.default_rng(0)
    img = D.render_line("AB12345678", rng, dot=True)
    assert img.shape == (D.IMG_H, D.IMG_W) and img.dtype == np.uint8
    # ink exists and is dot-structured: the 1px-shifted autocorrelation of
    # a dotted image differs from a solid-stroke render's
    assert (img < 200).sum() > 50
    imgs, labels, pad, texts = D.make_batch(
        4, np.random.default_rng(1), hard_frac=0.0, dot_frac=1.0)
    assert imgs.shape[0] == 4 and all(texts)
    # default batch path (dot_frac=0) must be byte-identical to before the
    # knob existed: same rng consumption, same pixels
    a = D.make_batch(2, np.random.default_rng(7))[0]
    b = D.make_batch(2, np.random.default_rng(7), dot_frac=0.0)[0]
    assert np.array_equal(a, b)


def test_dot_hard_band():
    """``dot_hard`` samples the 9-pin draft band (training-only): every
    draw lands at <= 9.5 dots/glyph, and the default dot path must be
    byte-identical with dot_hard_frac=0 (same rng consumption)."""
    from twinvoice_tpu.ocr.jaxocr import data as D

    img = D.render_line("AB12345678", np.random.default_rng(2), dot=True,
                        dot_hard=True)
    assert img.shape == (D.IMG_H, D.IMG_W) and (img < 200).sum() > 50
    imgs, _, _, texts = D.make_batch(
        4, np.random.default_rng(3), dot_frac=1.0, dot_hard_frac=1.0)
    assert imgs.shape[0] == 4 and all(texts)
    a = D.make_batch(2, np.random.default_rng(9), dot_frac=1.0)[0]
    b = D.make_batch(2, np.random.default_rng(9), dot_frac=1.0,
                     dot_hard_frac=0.0)[0]
    assert np.array_equal(a, b)


def test_wide_trunk_roundtrip(tmp_path):
    """Width-parameterized trunk: widths are recorded in the file and the
    loader rebuilds the right template (default-width files unaffected)."""
    import jax
    import jax.numpy as jnp

    from twinvoice_tpu.ocr.jaxocr.model import crnn_apply, init_crnn
    from twinvoice_tpu.ocr.jaxocr.train import load_weights_ex, save_weights

    params, state = init_crnn(jax.random.key(2), channels=(48, 96, 144, 192),
                              context=384)
    logits, _ = crnn_apply(params, state, jnp.zeros((1, 32, 256, 1)),
                           arch="t64")
    assert logits.shape[1] == 64
    path = str(tmp_path / "wide.npz")
    save_weights(path, params, state, arch="t64")
    p2, s2, cs2, a2 = load_weights_ex(path)
    assert a2 == "t64"
    a = jax.tree.leaves(params)[0]
    b = jax.tree.leaves(p2)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
