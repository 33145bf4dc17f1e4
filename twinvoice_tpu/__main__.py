"""Command-line entry points.

The reference ships bare scripts (``python train.py``,
``python rescue_masks_from_json_final.py``); here the same workflows are
subcommands of the package:

    python -m twinvoice_tpu build-dataset [--json-dir J --images-dir I ...]
    python -m twinvoice_tpu train [--epochs N --batch-size B ...]
    python -m twinvoice_tpu train-ocr [--steps N]
    python -m twinvoice_tpu app
"""

from __future__ import annotations

import argparse
import sys


def _cmd_build_dataset(args):
    from twinvoice_tpu.data.labelme import build_dataset_from_labelme

    done, missing = build_dataset_from_labelme(
        json_dir=args.json_dir,
        images_dir=args.images_dir,
        out_img_dir=args.out_images,
        out_mask_dir=args.out_masks,
        train_size=(args.size, args.size),
    )
    print(f"built {len(done)} samples; {len(missing)} missing images")


def _cmd_train(args):
    from twinvoice_tpu.config import Config, TrainConfig, UNetConfig
    from twinvoice_tpu.data.dataset import load_invoice_dataset
    from twinvoice_tpu.train import trainer

    cfg = Config(
        model=UNetConfig(),
        train=TrainConfig(
            batch_size=args.batch_size,
            epochs=args.epochs,
            lr=args.lr,
            val_fraction=args.val_fraction,
            checkpoint_dir=args.checkpoint_dir,
        ),
    )
    ds = load_invoice_dataset(args.images, args.masks)
    if len(ds) == 0:
        sys.exit(f"no samples found under {args.images} / {args.masks}")
    print(f"training on {len(ds)} samples")
    trainer.fit(ds, cfg, resume_dir=args.resume or None)


def _cmd_train_ocr(args):
    from twinvoice_tpu.ocr.jaxocr.train import train

    train(steps=args.steps)


def _cmd_app(_args):
    import subprocess

    subprocess.run(
        [sys.executable, "-m", "streamlit", "run",
         __file__.replace("__main__.py", "app/main.py")],
        check=True,
    )


def main(argv=None):
    p = argparse.ArgumentParser(prog="twinvoice_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build-dataset", help="labelme json+images → training pairs")
    b.add_argument("--json-dir", default="json")
    b.add_argument("--images-dir", default="images")
    b.add_argument("--out-images", default="fixed_images")
    b.add_argument("--out-masks", default="fixed_masks")
    b.add_argument("--size", type=int, default=512)
    b.set_defaults(fn=_cmd_build_dataset)

    t = sub.add_parser("train", help="train the U-Net segmenter")
    t.add_argument("--images", default="fixed_images")
    t.add_argument("--masks", default="fixed_masks")
    t.add_argument("--epochs", type=int, default=50)
    t.add_argument("--batch-size", type=int, default=4)
    t.add_argument("--lr", type=float, default=1e-3)
    t.add_argument("--val-fraction", type=float, default=0.0)
    t.add_argument("--checkpoint-dir", default="checkpoints")
    t.add_argument("--resume", default="")
    t.set_defaults(fn=_cmd_train)

    o = sub.add_parser("train-ocr", help="train the jaxocr CTC recognizer")
    o.add_argument("--steps", type=int, default=6000)
    o.set_defaults(fn=_cmd_train_ocr)

    a = sub.add_parser("app", help="launch the Streamlit UI")
    a.set_defaults(fn=_cmd_app)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
