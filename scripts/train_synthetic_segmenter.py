"""Train U-Net field-segmenter variants on synthetic invoices end-to-end.

The reference's shipped checkpoint exists only as a git-LFS pointer, so this
repo ships its own runnable segmenters, trained on procedurally rendered
invoices (data.synthetic) with photographic augmentation (data.augment):
random fonts, randomized layout, rotation/perspective/blur/JPEG/noise/
shadow/clutter. Quality is measured by the held-out perturbation gauntlet
(twinvoice_tpu.eval), NOT on the training distribution (VERDICT r1 #3).

Usage:
  python scripts/train_synthetic_segmenter.py \
      [--width 16] [--grid 512] [--n 240] [--epochs 40] \
      [--severity 0.6] [--out PATH] [--eval-n 25]

Default --out: twinvoice_tpu/models/weights/segmenter_synth_w{W}[_g{G}].npz
(the bundled-model path for w16@512).
"""

import argparse
import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

WEIGHTS_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "twinvoice_tpu", "models", "weights",
)


def render_base(n, seed=0, stylize=0.8):
    """n native-resolution (image, mask, (w,h)) renders with font/layout
    variety. Cached to /tmp (rendering is host-bound on this box).

    v3 adds per-field typography warping (``stylize``) + the widened
    train-font registry (VERDICT r2 #3: kill the held-out-font cliff)."""
    from twinvoice_tpu import FIELDS
    from twinvoice_tpu.data.synthetic import render_invoice, train_fonts

    # v5: ink-anchored ground-truth convention (synthetic.gt_anchor)
    key = hashlib.md5(
        f"synthbase-v5-{n}-{seed}-{stylize}".encode()
    ).hexdigest()[:10]
    cache = f"/tmp/synth_base_{key}.npz"
    if os.path.exists(cache):
        z = np.load(cache, allow_pickle=True)
        return list(z["packs"])

    rng = np.random.default_rng(seed)
    fonts = train_fonts()
    packs = []
    for i in range(n):
        letters = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
        inv_no = "".join(rng.choice(list(letters), 2)) + "".join(
            rng.choice(list("0123456789"), 8)
        )
        date = f"{rng.integers(2019, 2031)}-{rng.integers(1, 13):02d}-{rng.integers(1, 29):02d}"
        amount = int(rng.integers(1, 99999))
        w = int(rng.integers(360, 560))
        h = int(rng.integers(560, 760))
        img, boxes = render_invoice(
            inv_no, date, amount,
            items=[{"name": "測試品項", "qty": 1, "price": amount}],
            size=(w, h), seed=int(rng.integers(0, 2**31)),
            font_path=fonts[int(rng.integers(0, len(fonts)))],
            font_size=int(rng.integers(16, 29)),
            layout_jitter=0.7,
            stylize=float(stylize * rng.uniform(0.3, 1.0)),
        )
        arr = np.asarray(img)
        mask = np.zeros((h, w, 3), np.uint8)
        for c, f in enumerate(FIELDS):
            x1, y1, x2, y2 = boxes[f]
            mask[y1 : y2 + 1, x1 : x2 + 1, c] = 255
        packs.append((arr, mask))
        if (i + 1) % 40 == 0:
            print(f"  rendered {i + 1}/{n}", flush=True)
    np.savez_compressed(cache, packs=np.array(packs, dtype=object))
    return packs


def build_dataset(n, grid, seed=0, stylize=0.8):
    import cv2

    from twinvoice_tpu.data.dataset import ArrayDataset

    packs = render_base(n, seed, stylize=stylize)
    imgs = np.zeros((n, grid, grid, 3), np.uint8)
    masks = np.zeros((n, grid, grid, 3), np.uint8)
    for i, (img, mask) in enumerate(packs):
        imgs[i] = cv2.resize(img, (grid, grid), interpolation=cv2.INTER_LINEAR)
        masks[i] = cv2.resize(mask, (grid, grid), interpolation=cv2.INTER_NEAREST)
    return ArrayDataset(imgs, masks, tuple(f"synth_{i}" for i in range(n)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=16)
    ap.add_argument("--grid", type=int, default=512)
    ap.add_argument("--n", type=int, default=240)
    ap.add_argument("--stylize", type=float, default=0.8,
                    help="per-field typography warp strength (0 = legacy)")
    ap.add_argument("--epochs", type=int, default=40)
    ap.add_argument("--severity", type=float, default=0.6,
                    help="augmentation severity (0 disables)")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--out", default=None)
    ap.add_argument("--eval-n", type=int, default=25,
                    help="gauntlet cases per level after training (0 skips)")
    ap.add_argument("--resume", action="store_true",
                    help="resume from this config's /tmp checkpoint dir")
    ap.add_argument("--export-only", action="store_true",
                    help="skip training: load this config's checkpoint "
                    "(salvages a timed-out run) and write --out + eval")
    args = ap.parse_args()

    from twinvoice_tpu.config import Config, InferConfig, TrainConfig, UNetConfig
    from twinvoice_tpu.data.augment import AugmentedDataset
    from twinvoice_tpu.train import trainer
    from twinvoice_tpu.train.checkpoint import save_params_npz

    out = args.out
    if out is None:
        suffix = f"_g{args.grid}" if args.grid != 512 else ""
        out = os.path.join(WEIGHTS_DIR, f"segmenter_synth_w{args.width}{suffix}.npz")

    if not args.export_only:
        print(f"building {args.n} synthetic invoices @ {args.grid}²...",
              flush=True)
        ds = build_dataset(args.n, args.grid, stylize=args.stylize)
        if args.severity > 0:
            ds = AugmentedDataset(ds, severity=args.severity, p_clean=0.3)

    cfg = Config(
        model=UNetConfig(base_width=args.width),
        train=TrainConfig(
            batch_size=args.batch, epochs=args.epochs, lr=1e-3, dtype="bfloat16",
            val_fraction=0.1, visualize=False,
            checkpoint_dir=f"/tmp/seg_ckpt_w{args.width}_g{args.grid}",
        ),
    )
    # fit saves epoch snapshots under <checkpoint_dir>/latest; restore from it
    resume_dir = (
        os.path.join(cfg.train.checkpoint_dir, "latest") if args.resume else None
    )
    if args.export_only:
        # salvage path: a queue timeout can kill fit() after many epochs but
        # before save_params_npz — export straight from the 'best' snapshot
        from twinvoice_tpu.train import checkpoint as ckpt
        from twinvoice_tpu.train.trainer import (
            TrainState, make_optimizer)
        from twinvoice_tpu.models.unet import init_unet
        import jax

        best = os.path.join(cfg.train.checkpoint_dir, "best")
        src = best if ckpt.has_checkpoint(best) else os.path.join(
            cfg.train.checkpoint_dir, "latest")
        params, bn = init_unet(jax.random.key(0), cfg.model)
        template = TrainState(params, bn, make_optimizer(cfg.train).init(params))
        state = ckpt.restore(src, template)
        print(f"export-only: restored {src} (epoch {state.epoch})")
        history = [{"epoch": state.epoch, "loss": float("nan")}]
    else:
        state, history = trainer.fit(ds, cfg, resume_dir=resume_dir)
    save_params_npz(out, state.params, state.bn_state)
    print("saved", out, os.path.getsize(out) // 1024, "KB")
    print("final:", history[-1])

    if args.eval_n > 0:
        import jax.numpy as jnp

        from twinvoice_tpu.eval import (
            make_base_cases, perturb_cases, run_segmenter_gauntlet,
        )
        from twinvoice_tpu.infer.pipeline import Segmenter
        from twinvoice_tpu.train.checkpoint import load_params_npz

        params, bn = load_params_npz(out, UNetConfig(base_width=args.width))
        seg = Segmenter(
            params, bn, UNetConfig(base_width=args.width),
            InferConfig(img_size=args.grid), dtype=jnp.bfloat16,
        )
        base = make_base_cases(args.eval_n)
        for level in ("clean", "mild", "hard"):
            res = run_segmenter_gauntlet(seg, perturb_cases(base, level, seed=1))
            print(f"gauntlet {level}: iou={res['iou_mean']:.3f} "
                  f"box_hit={res['box_hit_mean']:.3f} {res['box_hit']}")


if __name__ == "__main__":
    main()
