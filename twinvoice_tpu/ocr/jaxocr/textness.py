"""Learned textness head: a ≤40k-param conv map vs the classical detector.

The reference's local OCR detector is EasyOCR's pretrained CRAFT
(app_camera.py:73, 817-833). Our classical analogue (detector._textness_map:
adaptive threshold + anisotropic dilation) is strong on clean print but
blind to context — shadows, halftone dots and desk clutter all look like
ink. This head learns the text/not-text decision from the same synthetic
distribution the rest of the stack trains on (VERDICT r2 #8), and is
A/B-ed against the classical map by scripts/train_textness.py before it
can become detect_lines' default.

Design: stride-4 fully-convolutional logit map, ~33k params — small
enough that a batch of pages costs one cheap device call, trained with
BCE against rasterized line boxes under the same photographic
perturbation engine (data/augment) the segmenter uses.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

DEFAULT_TEXTNESS_PATH = os.path.join(os.path.dirname(__file__), "textness.npz")

_WIDTHS = (16, 32, 48, 32)  # conv ladder; first two stride 2


def init_textness(key):
    import jax
    import jax.numpy as jnp

    keys = jax.random.split(key, len(_WIDTHS) + 1)
    params = []
    cin = 1
    for i, co in enumerate(_WIDTHS):
        fan = 9 * cin
        params.append({
            "kernel": jax.random.normal(keys[i], (3, 3, cin, co), jnp.float32)
            * np.sqrt(2.0 / fan),
            "bias": jnp.zeros((co,), jnp.float32),
        })
        cin = co
    params.append({
        "kernel": jax.random.normal(keys[-1], (1, 1, cin, 1), jnp.float32)
        * np.sqrt(2.0 / cin),
        "bias": jnp.zeros((1,), jnp.float32),
    })
    return params


def textness_apply(params, x):
    """x: (B, H, W, 1) f32 in [0,1], H,W % 4 == 0 → logits (B,H/4,W/4,1)."""
    import jax
    from jax import lax

    h = x
    for i, p in enumerate(params[:-1]):
        stride = 2 if i < 2 else 1
        h = lax.conv_general_dilated(
            h, p["kernel"].astype(h.dtype), (stride, stride), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + p["bias"]
        h = jax.nn.relu(h)
    p = params[-1]
    return lax.conv_general_dilated(
        h, p["kernel"].astype(h.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + p["bias"]


def n_params(params) -> int:
    import jax

    return sum(int(np.prod(l.shape)) for l in jax.tree.leaves(params))


# --------------------------------------------------------------- data gen


def render_textpage(rng: np.random.Generator, size: int = 256,
                    severity: float = 0.5):
    """One synthetic training page: random text lines on paper + non-text
    distractors (QR-ish blocks, rules, blobs), perturbed photographically.
    Returns (gray uint8 (size,size), mask uint8 (size,size) 0/255)."""
    import cv2
    from PIL import Image, ImageDraw, ImageFont

    from twinvoice_tpu.data import augment
    from twinvoice_tpu.data.synthetic import train_fonts
    from twinvoice_tpu.ocr.jaxocr.charset import CHARSET

    fonts = train_fonts()
    paper = np.full((size, size, 3), int(rng.integers(225, 252)), np.uint8)
    paper += rng.integers(0, 6, paper.shape, dtype=np.uint8)
    img = Image.fromarray(paper)
    draw = ImageDraw.Draw(img)
    mask = np.zeros((size, size), np.uint8)

    # non-text distractors FIRST (text may overlap them)
    for _ in range(int(rng.integers(0, 4))):
        kind = rng.integers(0, 3)
        x, y = int(rng.integers(0, size - 40)), int(rng.integers(0, size - 40))
        if kind == 0:  # QR-ish checkerboard
            n = int(rng.integers(6, 14))
            cell = int(rng.integers(2, 5))
            block = (rng.integers(0, 2, (n, n)) * 255).astype(np.uint8)
            block = cv2.resize(block, (n * cell, n * cell),
                               interpolation=cv2.INTER_NEAREST)
            bh, bw = block.shape
            y2, x2 = min(size, y + bh), min(size, x + bw)
            arr = np.array(img)
            arr[y:y2, x:x2] = block[: y2 - y, : x2 - x, None]
            img = Image.fromarray(arr)
            draw = ImageDraw.Draw(img)
        elif kind == 1:  # horizontal rule
            draw.line((x, y, min(size, x + int(rng.integers(40, 200))), y),
                      fill=0, width=int(rng.integers(1, 3)))
        else:  # solid blob
            r = int(rng.integers(4, 16))
            draw.ellipse((x, y, x + r, y + r), fill=int(rng.integers(0, 120)))

    chars = list(CHARSET.strip())
    for _ in range(int(rng.integers(3, 9))):
        n = int(rng.integers(4, 14))
        text = "".join(rng.choice(chars, n))
        fs = int(rng.integers(10, 24))
        font = ImageFont.truetype(fonts[int(rng.integers(0, len(fonts)))], fs)
        tw = int(draw.textlength(text, font=font))
        th = int(fs * 1.3)
        if tw >= size - 4:
            continue
        x = int(rng.integers(2, size - tw - 2))
        y = int(rng.integers(2, size - th - 2))
        draw.text((x, y), text, fill=int(rng.integers(0, 90)), font=font)
        mask[max(0, y - 1) : y + th + 1, max(0, x - 1) : x + tw + 1] = 255

    if severity > 0:
        arr, m = augment.perturb(np.asarray(img), mask[..., None], rng,
                                 severity)
        mask = m[..., 0]
        gray = cv2.cvtColor(arr, cv2.COLOR_RGB2GRAY)
    else:
        gray = cv2.cvtColor(np.asarray(img), cv2.COLOR_RGB2GRAY)
    return gray, mask


def make_batch(bs: int, rng: np.random.Generator, size: int = 256):
    imgs = np.zeros((bs, size, size, 1), np.float32)
    labels = np.zeros((bs, size // 4, size // 4, 1), np.float32)
    import cv2

    for i in range(bs):
        g, m = render_textpage(rng, size)
        imgs[i, :, :, 0] = g / 255.0
        labels[i, :, :, 0] = (
            cv2.resize(m, (size // 4, size // 4),
                       interpolation=cv2.INTER_AREA) > 64
        )
    return imgs, labels


# ------------------------------------------------------------ train / io


def save_textness(path, params):
    import jax

    flat = {}
    for i, leaf in enumerate(jax.tree.leaves(params)):
        flat[f"l{i}"] = np.asarray(leaf)
    np.savez_compressed(path, **flat)


def load_textness(path: Optional[str] = None):
    """→ params, or None when no weights are bundled."""
    import jax
    import jax.numpy as jnp

    path = path or DEFAULT_TEXTNESS_PATH
    if not os.path.exists(path):
        return None
    z = np.load(path)
    template = init_textness(jax.random.key(0))
    leaves, treedef = jax.tree.flatten(template)
    got = [jnp.asarray(z[f"l{i}"]) for i in range(len(leaves))]
    assert all(a.shape == b.shape for a, b in zip(got, leaves))
    return jax.tree.unflatten(treedef, got)


def train(steps: int = 1500, bs: int = 32, lr: float = 2e-3, seed: int = 0,
          out_path: Optional[str] = None, log=print, cache_batches: int = 48):
    import jax
    import jax.numpy as jnp
    import optax

    rng = np.random.default_rng(seed)
    params = init_textness(jax.random.key(seed))
    log(f"textness head: {n_params(params)} params")
    opt = optax.adamw(optax.cosine_decay_schedule(lr, steps), weight_decay=1e-5)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, x, y):
        def loss_fn(p):
            logits = textness_apply(p, x)
            # class-balanced BCE: text pixels are the minority
            pos = jnp.maximum(y.mean(), 1e-3)
            w = y / pos + (1 - y) / (1 - pos)
            return jnp.mean(
                w * optax.sigmoid_binary_cross_entropy(logits, y))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    pool = [make_batch(bs, rng) for _ in range(cache_batches)]
    log(f"pre-rendered {cache_batches} batches")
    import time

    t0 = time.time()
    for it in range(1, steps + 1):
        x, y = pool[int(rng.integers(0, len(pool)))]
        params, opt_state, loss = step(params, opt_state,
                                       jnp.asarray(x), jnp.asarray(y))
        if it % 200 == 0 or it == 1:
            log(f"step {it}/{steps} loss {float(loss):.4f} "
                f"({time.time()-t0:.0f}s)")
    if out_path:
        save_textness(out_path, params)
        log(f"saved {out_path}")
    return params


# ------------------------------------------------------------- inference


_jitted_apply = None


def textness_logits(gray_u8: np.ndarray, params) -> np.ndarray:
    """uint8 (H, W) grayscale → float32 (H, W) textness LOGIT map at full
    resolution (nearest-upsampled from the stride-4 head output)."""
    global _jitted_apply
    import cv2
    import jax

    if _jitted_apply is None:
        _jitted_apply = jax.jit(textness_apply)
    h, w = gray_u8.shape
    hb, wb = -(-h // 64) * 64, -(-w // 64) * 64
    padded = np.full((hb, wb), 255, np.uint8)
    padded[:h, :w] = gray_u8
    import jax.numpy as jnp

    x = jnp.asarray(padded[None, :, :, None], jnp.float32) / 255.0
    logits = np.asarray(_jitted_apply(params, x))[0, :, :, 0]
    full = cv2.resize(logits, (wb, hb), interpolation=cv2.INTER_NEAREST)
    return full[:h, :w]


def textness_map(gray_u8: np.ndarray, params) -> np.ndarray:
    """uint8 (H, W) grayscale → bool (H, W) learned text map (the drop-in
    replacement for detector._textness_map's output)."""
    return textness_logits(gray_u8, params) > 0.0  # sigmoid > 0.5
