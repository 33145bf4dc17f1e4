"""Error analysis for the jaxocr recognizer (VERDICT r3 #5: 'error
analysis first: charset confusions vs line-split vs warp severity').

Evaluates the bundled weights on the warped eval distribution and breaks
misses down by: character-level confusion pairs (Levenshtein-aligned
substitutions), text kind (invoice-no / date / ROC date / amount /
generic / CJK), string length, and ablated render severity (clean vs
rotate vs shear/morph vs photometric) so the dominant failure mode is
measured, not guessed.

Usage: python scripts/ocr_error_analysis.py [n_batches] [--cjk]
"""

import os
import sys
from collections import Counter, defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def align_subs(a: str, b: str):
    """Levenshtein alignment of got→want; returns (subs, dels, ins) where
    subs is a list of (want_char, got_char)."""
    la, lb = len(a), len(b)
    dp = np.zeros((la + 1, lb + 1), np.int32)
    dp[:, 0] = np.arange(la + 1)
    dp[0, :] = np.arange(lb + 1)
    for i in range(1, la + 1):
        for j in range(1, lb + 1):
            dp[i, j] = min(dp[i - 1, j] + 1, dp[i, j - 1] + 1,
                           dp[i - 1, j - 1] + (a[i - 1] != b[j - 1]))
    subs, dels, ins = [], [], []
    i, j = la, lb
    while i > 0 or j > 0:
        if i > 0 and j > 0 and dp[i, j] == dp[i - 1, j - 1] + (a[i - 1] != b[j - 1]):
            if a[i - 1] != b[j - 1]:
                subs.append((a[i - 1], b[j - 1]))
            i, j = i - 1, j - 1
        elif i > 0 and dp[i, j] == dp[i - 1, j] + 1:
            dels.append(a[i - 1])
            i -= 1
        else:
            ins.append(b[j - 1])
            j -= 1
    return subs, dels, ins


def text_kind(t: str) -> str:
    import re
    if any(ord(c) > 0x2E00 for c in t):
        return "cjk"
    if re.fullmatch(r"[A-Z]{2}-?\d{8}", t):
        return "invoice_no"
    if re.fullmatch(r"\d{4}[-/.]\d{2}[-/.]\d{2}", t):
        return "date"
    if re.fullmatch(r"1\d{2}/\d{2}/\d{2}", t):
        return "roc_date"
    if re.search(r"\d", t) and re.fullmatch(r"(NT\$|\$|TX |TOTAL )?[\d,]+", t):
        return "amount"
    return "generic"


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from twinvoice_tpu.ocr.jaxocr import data as D
    from twinvoice_tpu.ocr.jaxocr import train as T

    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    params, state, charset, arch = T.load_weights_ex()
    print(f"charset size {charset.num_classes} arch {arch}")
    infer = jax.jit(lambda x: T.crnn_apply(params, state, x, train=False, arch=arch)[0])

    rng = np.random.default_rng(7)
    kinds = defaultdict(lambda: [0, 0])         # kind -> [miss, total]
    lens = defaultdict(lambda: [0, 0])
    confusions = Counter()
    del_c, ins_c = Counter(), Counter()
    examples = []
    exact = total = errs = chars = 0
    for _ in range(n_batches):
        imgs, labels, pad, texts = D.make_batch(64, rng, charset)
        ids = np.asarray(jnp.argmax(infer(jnp.asarray(imgs)), axis=-1))
        for row, want in zip(ids, texts):
            got = charset.greedy_ctc_decode(row)
            k = text_kind(want)
            hit = got == want
            exact += hit
            total += 1
            kinds[k][1] += 1
            lens[len(want) // 4 * 4][1] += 1
            if not hit:
                kinds[k][0] += 1
                lens[len(want) // 4 * 4][0] += 1
                s, d, i = align_subs(want, got)
                confusions.update(s)
                del_c.update(d)
                ins_c.update(i)
                errs += len(s) + len(d) + len(i)
                if len(examples) < 25:
                    examples.append((want, got))
            chars += max(1, len(want))

    print(f"\nexact {exact}/{total} = {exact/total:.3f}   CER {errs/chars:.4f}")
    print("\nby kind (miss/total):")
    for k, (m, t) in sorted(kinds.items(), key=lambda kv: -kv[1][0]):
        print(f"  {k:12s} {m:4d}/{t:4d}  ({m/t:.2%} miss)")
    print("\nby length bucket (miss/total):")
    for k, (m, t) in sorted(lens.items()):
        print(f"  len {k:2d}-{k+3:2d}  {m:4d}/{t:4d}  ({m/t:.2%})")
    print("\ntop confusions (want->got):")
    for (w, g), c in confusions.most_common(20):
        print(f"  {w!r} -> {g!r}: {c}")
    print("\ntop deletions (model dropped):", del_c.most_common(12))
    print("top insertions (model added):", ins_c.most_common(12))
    print("\nsample misses:")
    for w, g in examples:
        print(f"  want {w!r}  got {g!r}")

    # ---- severity ablation: which augmentation knob drives the misses? ---
    # Re-render a fixed text set under one-knob-at-a-time patched renderers.
    print("\nseverity ablation (same 256 texts, knobs isolated):")
    texts_fixed = [D.random_field_text(np.random.default_rng(1000 + i), charset)
                   for i in range(256)]

    real_random = np.random.default_rng

    class KnobRng:
        """Wraps a Generator; forces chosen rng.random() gates off."""
        def __init__(self, inner, kill):
            self._i = inner
            self._kill = kill  # indices of random() calls to force >gate

        def __getattr__(self, a):
            return getattr(self._i, a)

    def run_eval(texts, patch=None):
        # patch: fn(rng) -> rng-like passed to render_line
        ex = 0
        batch = []
        for i, t in enumerate(texts):
            r = np.random.default_rng(5000 + i)
            arr = D.render_line(t, patch(r) if patch else r)
            batch.append(arr.astype(np.float32)[None, ..., None] / 255.0)
        x = jnp.asarray(np.concatenate(batch, 0))
        ids = np.asarray(jnp.argmax(infer(x), axis=-1))
        for row, want in zip(ids, texts):
            ex += charset.greedy_ctc_decode(row) == want
        return ex / len(texts)

    class NoAug:
        """rng whose .random() returns 1.0 → every optional knob disabled."""
        def __init__(self, inner):
            self._i = inner

        def random(self):
            return 1.0

        def __getattr__(self, a):
            return getattr(self._i, a)

    class OnlyCall:
        """rng whose Nth+ .random() returns 1.0 (keeps early knobs live)."""
        def __init__(self, inner, n_live):
            self._i = inner
            self._n = n_live
            self._c = 0

        def random(self):
            self._c += 1
            if self._c > self._n:
                return 1.0
            return self._i.random()

        def __getattr__(self, a):
            return getattr(self._i, a)

    # knob call order inside render_line: rotate(1), warp(2), photometrics(3+)
    print(f"  all knobs on : {run_eval(texts_fixed):.3f}")
    print(f"  no aug at all: {run_eval(texts_fixed, NoAug):.3f}")
    print(f"  rotate only  : {run_eval(texts_fixed, lambda r: OnlyCall(r, 1)):.3f}")
    print(f"  rotate+warp  : {run_eval(texts_fixed, lambda r: OnlyCall(r, 2)):.3f}")


if __name__ == "__main__":
    main()
