"""Train a compact U-Net field segmenter on synthetic invoices end-to-end.

The reference's shipped checkpoint exists only as a git-LFS pointer, so this
repo ships its own runnable segmenter: a base_width=16 U-Net (~1.9M params,
small enough to commit as npz) trained on procedurally rendered invoices
(data.synthetic). Layout of fields is randomized so the model learns to find
text regions, not positions.

Usage: python scripts/train_synthetic_segmenter.py [n_train] [epochs]
Writes twinvoice_tpu/models/weights/segmenter_synth_w16.npz and prints IoU.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

WEIGHTS_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "twinvoice_tpu", "models", "weights", "segmenter_synth_w16.npz",
)


def make_invoice_sample(rng, size=512):
    """One (image, mask) training pair at `size`² from a rendered invoice."""
    import cv2

    from twinvoice_tpu.data.synthetic import render_invoice

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
    )
    arr = np.asarray(img)
    img_r = cv2.resize(arr, (size, size), interpolation=cv2.INTER_LINEAR)
    mask = np.zeros((size, size, 3), np.uint8)
    sx, sy = size / w, size / h
    for ch, field in enumerate(("invoice_no", "date", "total_amount")):
        x1, y1, x2, y2 = boxes[field]
        mask[int(y1 * sy):int(y2 * sy) + 1, int(x1 * sx):int(x2 * sx) + 1, ch] = 255
    return img_r, mask


def build_dataset(n, seed=0, size=512):
    from twinvoice_tpu.data.dataset import ArrayDataset

    rng = np.random.default_rng(seed)
    imgs = np.zeros((n, size, size, 3), np.uint8)
    masks = np.zeros((n, size, size, 3), np.uint8)
    for i in range(n):
        imgs[i], masks[i] = make_invoice_sample(rng, size)
    return ArrayDataset(imgs, masks, tuple(f"synth_{i}" for i in range(n)))


from twinvoice_tpu.train.checkpoint import load_params_npz, save_params_npz  # noqa: E402


def main(n_train=160, epochs=25):
    from twinvoice_tpu.config import Config, TrainConfig, UNetConfig
    from twinvoice_tpu.train import trainer

    print(f"building {n_train} synthetic invoices...", flush=True)
    ds = build_dataset(n_train)
    cfg = Config(
        model=UNetConfig(base_width=16),
        train=TrainConfig(
            batch_size=8, epochs=epochs, lr=1e-3, dtype="bfloat16",
            val_fraction=0.1, visualize=False,
            checkpoint_dir="/tmp/seg_ckpt",
        ),
    )
    state, history = trainer.fit(ds, cfg)
    save_params_npz(WEIGHTS_PATH, state.params, state.bn_state)
    print("saved", WEIGHTS_PATH, os.path.getsize(WEIGHTS_PATH) // 1024, "KB")
    print("final:", history[-1])


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 160
    e = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    main(n, e)
