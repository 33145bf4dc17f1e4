"""Per-epoch visual QA dumps — feature parity with the reference's
``visualize`` (train.py:65-87): first train image, true mask and predicted
mask as RGB PNGs, with true-mask threshold 0.5 and pred-prob threshold 0.3.
Layout here is NHWC (reference is CHW).
"""

from __future__ import annotations

import os

import numpy as np

# class → display color, same channel→RGB assignment as train.py:76-78
_COLORS = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]], np.uint8)


def _mask_to_rgb(mask_hwc, threshold):
    h, w, c = mask_hwc.shape
    out = np.zeros((h, w, 3), np.uint8)
    for ch in range(min(c, 3)):
        out[mask_hwc[:, :, ch] > threshold] = _COLORS[ch]
    return out


def dump_epoch_visual(image_hwc, true_mask_hwc, params, bn_state, model_cfg, out_dir, name):
    """Save {name}_img/true/pred.png under ``out_dir``."""
    from PIL import Image
    import jax
    import jax.numpy as jnp

    from twinvoice_tpu.models.unet import unet_apply

    os.makedirs(out_dir, exist_ok=True)
    img_u8 = np.clip(image_hwc * 255.0, 0, 255).astype(np.uint8)
    Image.fromarray(img_u8).save(os.path.join(out_dir, f"{name}_img.png"))
    Image.fromarray(_mask_to_rgb(true_mask_hwc, 0.5)).save(
        os.path.join(out_dir, f"{name}_true.png")
    )
    logits, _ = unet_apply(
        params, bn_state, jnp.asarray(image_hwc, jnp.float32)[None], cfg=model_cfg, train=False
    )
    prob = np.asarray(jax.nn.sigmoid(logits[0].astype(jnp.float32)))
    Image.fromarray(_mask_to_rgb(prob, 0.3)).save(
        os.path.join(out_dir, f"{name}_pred.png")
    )
