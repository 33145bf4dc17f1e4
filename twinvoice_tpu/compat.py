"""Drop-in convenience API mirroring the reference's entry points.

Reference users call ``run_unet(pil_img, checkpoint_path)`` (inference.py:50)
and get ``(masks, crops)``; that function rebuilds the model and re-reads the
124 MB checkpoint from disk on every call. Here the same signature is backed
by a process-level Segmenter cache keyed on (checkpoint path, mtime), so the
model loads once and the fused TPU graph is reused.
"""

from __future__ import annotations

import os
import threading
from typing import Dict, Tuple

import numpy as np

from twinvoice_tpu.config import InferConfig, UNetConfig

IMG_SIZE = 512
FIELDS = ["invoice_no", "date", "total_amount"]

_cache_lock = threading.Lock()
_segmenters: Dict[Tuple[str, float], object] = {}


def load_model(checkpoint_path: str, *, dtype=None):
    """Reference ``load_model`` equivalent → a Segmenter (cached).

    Accepts either a torch ``.pth`` file (reference schema) or an orbax
    checkpoint directory produced by twinvoice_tpu.train.
    """
    import jax.numpy as jnp

    from twinvoice_tpu.infer.pipeline import Segmenter

    dtype = dtype or jnp.float32  # reference parity default; pass bf16 to serve
    mtime = os.path.getmtime(checkpoint_path) if os.path.exists(checkpoint_path) else 0.0
    key = (os.path.abspath(checkpoint_path), mtime, str(dtype))
    with _cache_lock:
        seg = _segmenters.get(key)
        if seg is None:
            if os.path.isdir(checkpoint_path):
                seg = Segmenter.from_checkpoint(
                    checkpoint_path, UNetConfig(), InferConfig(), dtype=dtype
                )
            else:
                seg = Segmenter.from_pth(
                    checkpoint_path, UNetConfig(), InferConfig(), dtype=dtype
                )
            _segmenters[key] = seg
    return seg


def preprocess(pil_img) -> np.ndarray:
    """Reference ``preprocess`` contract (inference.py:30-44) in NHWC:
    RGB → 512×512 → float/255 → (1, 512, 512, 3)."""
    img = pil_img.convert("RGB").resize((IMG_SIZE, IMG_SIZE))
    arr = np.asarray(img, np.float32) / 255.0
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError(f"Invalid image shape: {arr.shape}")
    return arr[None]


def run_unet(pil_img, checkpoint_path: str):
    """Reference ``run_unet`` (inference.py:50-129) drop-in: returns
    ``(masks: dict[field, bool (512,512)], crops: dict[field, PIL|None])``
    with the same thresholds/padding/rejection semantics — but the model
    loads once per process instead of once per call."""
    return load_model(checkpoint_path).segment_pil(pil_img)
