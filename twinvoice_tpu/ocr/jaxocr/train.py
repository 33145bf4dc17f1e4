"""CTC training for the recognizer. Runs on whatever device JAX has (the
real TPU under the driver; tiny enough for CPU smoke tests).

Usage: ``python -m twinvoice_tpu.ocr.jaxocr.train [steps] [out_dir]``
Saves an orbax weights-only checkpoint the engine loads lazily.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
import optax

from twinvoice_tpu.ocr.jaxocr import data as D
from twinvoice_tpu.ocr.jaxocr.charset import CHARSET, Charset, DEFAULT
from twinvoice_tpu.ocr.jaxocr.model import crnn_apply, init_crnn

DEFAULT_WEIGHTS_PATH = os.path.join(os.path.dirname(__file__), "weights.npz")
DEFAULT_WEIGHTS_DIR = DEFAULT_WEIGHTS_PATH  # backwards-friendly alias


def make_train_step(optimizer, arch="t32"):
    def step(params, state, opt_state, imgs, labels, label_pad):
        def loss_fn(p):
            logits, new_state = crnn_apply(p, state, imgs, train=True, arch=arch)
            logit_pad = jnp.zeros(logits.shape[:2], jnp.float32)  # all frames valid
            loss = jnp.mean(
                optax.ctc_loss(
                    logits.astype(jnp.float32), logit_pad, labels, label_pad
                )
            )
            return loss, new_state

        (loss, new_state), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_state, opt_state, loss

    return jax.jit(step, donate_argnums=(0, 1, 2))


def evaluate(params, state, rng, n_batches=4, batch_size=64, charset=DEFAULT,
             arch="t32"):
    """→ (exact-match rate, char error rate) on fresh synthetic batches."""
    infer = jax.jit(lambda p, s, x: crnn_apply(p, s, x, train=False, arch=arch)[0])
    exact = total = 0
    errs = chars = 0
    for _ in range(n_batches):
        imgs, labels, pad, texts = D.make_batch(batch_size, rng, charset)
        logits = infer(params, state, jnp.asarray(imgs))
        ids = np.asarray(jnp.argmax(logits, axis=-1))
        for row, text in zip(ids, texts):
            got = charset.greedy_ctc_decode(row)
            exact += got == text
            total += 1
            errs += _levenshtein(got, text)
            chars += max(1, len(text))
    return exact / total, errs / chars


def _levenshtein(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def save_weights(out_path, params, state, charset: Charset = DEFAULT,
                 arch="t32"):
    """Portable flat .npz; embeds the charset, the pooling arch AND the
    trunk widths so the file is self-describing (no device/sharding
    metadata — loads anywhere)."""
    widths = [int(c["kernel"].shape[-1]) for c in params["conv"]]
    context = int(params["proj"]["kernel"].shape[-1])
    flat = {"charset": np.array(charset.chars), "arch": np.array(arch),
            "channels": np.array(widths, np.int32),
            "context": np.array(context, np.int32)}
    for prefix, tree in (("p", params), ("s", state)):
        for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
            key = prefix + "/" + jax.tree_util.keystr(path)
            flat[key] = np.asarray(leaf)
    np.savez_compressed(out_path, **flat)


def load_weights(weights_path=DEFAULT_WEIGHTS_PATH):
    """→ (params, state, charset); see :func:`load_weights_ex` for the arch."""
    return load_weights_ex(weights_path)[:3]


def load_weights_ex(weights_path=DEFAULT_WEIGHTS_PATH):
    """→ (params, state, charset, arch) — charset and pooling arch read
    from the file (older files without them get the ASCII charset / the
    legacy "t32" arch)."""
    with np.load(weights_path) as z:
        charset = Charset(str(z["charset"])) if "charset" in z else Charset(CHARSET)
        arch = str(z["arch"]) if "arch" in z else "t32"
        from twinvoice_tpu.ocr.jaxocr.model import _CONTEXT, _CONV_CHANNELS

        channels = (tuple(int(c) for c in z["channels"])
                    if "channels" in z else _CONV_CHANNELS)
        context = int(z["context"]) if "context" in z else _CONTEXT
        template_p, template_s = init_crnn(
            jax.random.key(0), num_classes=charset.num_classes,
            channels=channels, context=context,
        )

        def rebuild(prefix, tree):
            leaves_with_paths, treedef = jax.tree_util.tree_flatten_with_path(tree)
            leaves = [
                jnp.asarray(z[prefix + "/" + jax.tree_util.keystr(path)])
                for path, _ in leaves_with_paths
            ]
            return jax.tree_util.tree_unflatten(treedef, leaves)

        return rebuild("p", template_p), rebuild("s", template_s), charset, arch


def train(steps=3000, batch_size=64, lr=3e-4, seed=0, out_dir=DEFAULT_WEIGHTS_DIR,
          log=print, charset: Charset = DEFAULT, cache_batches: int = 0,
          arch="t64", resume_from=None, hard_frac: float = 0.0,
          sev_frac: float = 0.0, dot_frac: float = 0.0,
          mixed_frac: float = 0.0, synth_frac: float = 0.0,
          dot_hard_frac: float = 0.0,
          wide: bool = False, refresh: bool = False):
    """``cache_batches``: when >0, pre-render that many batches once and
    cycle them (fresh randomness per render). CJK stroke rendering on a
    1-core host otherwise starves the device; eval always uses fresh
    batches, so the reported accuracy is not memorization.

    ``refresh``: with a cache, run a daemon thread that continuously
    re-renders random pool entries in place while the device trains.
    Diagnosis (r5): long cached runs drive the TRAIN loss to ~0.001 —
    the model memorizes the 32k-sample pool and extra capacity stops
    paying (the wide-trunk A/B converged barely above its 40k point).
    The refresher cycles the whole pool every ~2 minutes, so the
    effective dataset is unbounded again while the device never waits
    on the renderer (PIL/cv2/numpy release the GIL).

    ``hard_frac``: fraction of TRAINING samples drawn from the
    :func:`data.random_hard_text` failure-taxonomy sampler (O/0-dense
    format-free strings, space/symbol boundaries, doubled chars, random
    CJK+digit combos). Eval batches never use it."""
    rng = np.random.default_rng(seed)
    if resume_from:
        params, state, cs2, a2 = load_weights_ex(resume_from)
        assert a2 == arch and cs2.chars == charset.chars, (
            "resume_from arch/charset mismatch")
        log(f"warm-starting from {resume_from}")
    else:
        kw = ({"channels": (48, 96, 144, 192), "context": 384}
              if wide else {})
        params, state = init_crnn(jax.random.key(seed),
                                  num_classes=charset.num_classes, **kw)
    optimizer = optax.adamw(
        optax.warmup_cosine_decay_schedule(0.0, lr, 100, steps), weight_decay=1e-5
    )
    opt_state = optimizer.init(params)
    step_fn = make_train_step(optimizer, arch=arch)

    pool = None
    stop_refresh: list = []
    if cache_batches:
        t0 = time.time()
        pool = [D.make_batch(batch_size, rng, charset, hard_frac=hard_frac,
                              sev_frac=sev_frac, dot_frac=dot_frac,
                              mixed_frac=mixed_frac, synth_frac=synth_frac,
                        dot_hard_frac=dot_hard_frac)[:3]
                for _ in range(cache_batches)]
        log(f"pre-rendered {cache_batches} batches in {time.time()-t0:.0f}s")
        if refresh:
            import threading

            def _refresher():
                rr = np.random.default_rng(seed + 987_654)
                renders = 0
                while not stop_refresh:
                    i = int(rr.integers(0, len(pool)))
                    pool[i] = D.make_batch(
                        batch_size, rr, charset, hard_frac=hard_frac,
                        sev_frac=sev_frac, dot_frac=dot_frac,
                        mixed_frac=mixed_frac, synth_frac=synth_frac,
                        dot_hard_frac=dot_hard_frac)[:3]
                    renders += 1

            threading.Thread(target=_refresher, daemon=True).start()
            log("cache refresher running (continuous in-place re-render)")

    t0 = time.time()
    for it in range(1, steps + 1):
        if pool is not None:
            imgs, labels, pad = pool[int(rng.integers(0, len(pool)))]
        else:
            imgs, labels, pad, _ = D.make_batch(batch_size, rng, charset,
                                                hard_frac=hard_frac,
                                                sev_frac=sev_frac,
                                                dot_frac=dot_frac,
                                                mixed_frac=mixed_frac,
                                                synth_frac=synth_frac,
                                                dot_hard_frac=dot_hard_frac)
        params, state, opt_state, loss = step_fn(
            params, state, opt_state,
            jnp.asarray(imgs), jnp.asarray(labels), jnp.asarray(pad),
        )
        if it % 200 == 0 or it == 1:
            log(f"step {it}/{steps} loss {float(loss):.4f} ({time.time()-t0:.0f}s)")
        if it % 1000 == 0 and it < steps:
            # periodic snapshot: a multi-hour CPU run must survive a kill
            save_weights(out_dir, params, state, charset, arch=arch)
            log(f"snapshot saved at step {it}")
    stop_refresh.append(True)
    acc, cer = evaluate(params, state, np.random.default_rng(seed + 1),
                        charset=charset, arch=arch)
    log(f"eval: exact={acc:.3f} cer={cer:.4f}")
    save_weights(out_dir, params, state, charset, arch=arch)
    log(f"saved weights to {out_dir}")
    return params, state, {"exact": acc, "cer": cer}


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3000
    out = sys.argv[2] if len(sys.argv) > 2 else DEFAULT_WEIGHTS_DIR
    cs = DEFAULT
    if "--cjk" in sys.argv:
        from twinvoice_tpu.ocr.jaxocr.charset import cjk_charset

        cs = cjk_charset()
    cache = 0
    resume = None
    hard = 0.0
    sev = 0.0
    dot = 0.0
    dothard = 0.0
    mixed = 0.0
    synth = 0.0
    lr = 3e-4
    for a in sys.argv:
        if a.startswith("--cache="):
            cache = int(a.split("=")[1])
        if a.startswith("--resume="):
            resume = a.split("=", 1)[1]
        if a.startswith("--hard="):
            hard = float(a.split("=")[1])
        if a.startswith("--sev="):
            sev = float(a.split("=")[1])
        if a.startswith("--dot="):
            dot = float(a.split("=")[1])
        if a.startswith("--dothard="):
            dothard = float(a.split("=")[1])
        if a.startswith("--mixed="):
            mixed = float(a.split("=")[1])
        if a.startswith("--synth="):
            synth = float(a.split("=")[1])
        if a.startswith("--lr="):
            lr = float(a.split("=")[1])
    arch = "t32" if "--t32" in sys.argv else "t64"
    wide = "--wide" in sys.argv
    train(steps=n, out_dir=out, charset=cs, cache_batches=cache, arch=arch,
          resume_from=resume, hard_frac=hard, lr=lr, sev_frac=sev,
          dot_frac=dot, mixed_frac=mixed, synth_frac=synth, wide=wide,
          dot_hard_frac=dothard, refresh="--refresh" in sys.argv)
