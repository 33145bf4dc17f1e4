"""Bundled pretrained models.

Three in-repo segmenters trained by ``scripts/train_synthetic_segmenter.py``
on procedurally rendered invoices with photographic augmentation; every
quality number cited below is from the held-out perturbation gauntlet
(``twinvoice_tpu.eval``: unseen content seeds + fonts, clean/mild/hard
photographic tiers), NOT the training distribution:

========================  ====== ===== ==========================================
variant                   width  grid  gauntlet (IoU clean/mild/hard; box-hit)
========================  ====== ===== ==========================================
``w16`` (default)         16     512   0.95 / 0.95 / 0.93; box-hit 1.0 everywhere
``w16_g384`` (streaming)  16     384   0.95 / 0.94 / 0.92; box-hit 1.0 everywhere
``w64`` (reference arch)  64     512   0.95 / 0.94 / 0.93; box-hit 1.0 everywhere
========================  ====== ===== ==========================================

``w16`` is the throughput flagship (2732 img/s/chip batch-128 bf16 2-in-flight,
docs/PERFORMANCE.md); ``w64`` is the reference's 31.04M-param architecture
(unet_model.py:23-53) for drop-in parity work — production deployments can
instead port the reference's own ``.pth`` via ``twinvoice_tpu.port``.
Real-photo accuracy is unmeasured in this environment (docs/PARITY.md).
"""

from __future__ import annotations

import os

from twinvoice_tpu.config import InferConfig, UNetConfig

WEIGHTS_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "weights")

VARIANTS = {
    "w16": ("segmenter_synth_w16.npz", UNetConfig(base_width=16), 512),
    "w16_g384": ("segmenter_synth_w16_g384.npz", UNetConfig(base_width=16), 384),
    "w64": ("segmenter_synth_w64.npz", UNetConfig(base_width=64), 512),
}

# backward-compatible aliases (round-1 surface)
SEGMENTER_SYNTH_W16 = os.path.join(WEIGHTS_DIR, VARIANTS["w16"][0])
SEGMENTER_SYNTH_CFG = VARIANTS["w16"][1]


def variant_path(variant: str) -> str:
    return os.path.join(WEIGHTS_DIR, VARIANTS[variant][0])


def load_pretrained_segmenter(dtype=None, infer_cfg: InferConfig = None,
                              variant: str = "w16", **segmenter_kw):
    """→ a ready infer.Segmenter on bundled trained weights.

    ``infer_cfg`` defaults to the variant's training grid. Extra kwargs
    (e.g. ``int8_calib``) pass through to :class:`~..infer.pipeline.Segmenter`.
    """
    import jax.numpy as jnp

    from twinvoice_tpu.infer.pipeline import Segmenter
    from twinvoice_tpu.train.checkpoint import load_params_npz

    fname, mcfg, grid = VARIANTS[variant]
    if infer_cfg is None:
        infer_cfg = InferConfig(img_size=grid)
    params, state = load_params_npz(variant_path(variant), mcfg)
    return Segmenter(
        params, state, mcfg, infer_cfg,
        dtype=dtype or jnp.bfloat16, **segmenter_kw,
    )


def available(variant: str = "w16") -> bool:
    return os.path.exists(variant_path(variant))
