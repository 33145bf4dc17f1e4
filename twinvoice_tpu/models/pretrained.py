"""Bundled pretrained models.

``segmenter_synth_w16.npz`` is a base_width=16 U-Net trained in-repo on
procedurally rendered invoices (scripts/train_synthetic_segmenter.py);
val IoU 0.98/0.99/0.98 per field. The full-system eval (trained segmenter →
crops → jaxocr recognizer → fusion, QR disabled) reads invoice number,
date and amount at 100% on a fresh synthetic held-out set. Intended as the
out-of-the-box demo model; production deployments train on real photos via
the same trainer (or port the reference's .pth via twinvoice_tpu.port).
"""

from __future__ import annotations

import os

from twinvoice_tpu.config import InferConfig, UNetConfig

WEIGHTS_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "weights")
SEGMENTER_SYNTH_W16 = os.path.join(WEIGHTS_DIR, "segmenter_synth_w16.npz")
SEGMENTER_SYNTH_CFG = UNetConfig(base_width=16)


def load_pretrained_segmenter(dtype=None, infer_cfg: InferConfig = InferConfig()):
    """→ a ready infer.Segmenter on the bundled synthetic-trained weights."""
    import jax.numpy as jnp

    from twinvoice_tpu.infer.pipeline import Segmenter
    from twinvoice_tpu.train.checkpoint import load_params_npz

    params, state = load_params_npz(SEGMENTER_SYNTH_W16, SEGMENTER_SYNTH_CFG)
    return Segmenter(
        params, state, SEGMENTER_SYNTH_CFG, infer_cfg,
        dtype=dtype or jnp.bfloat16,
    )


def available() -> bool:
    return os.path.exists(SEGMENTER_SYNTH_W16)
