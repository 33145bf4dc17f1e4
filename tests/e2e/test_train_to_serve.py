"""Full loop: train a tiny U-Net on synthetic data, then serve it through
the fused Segmenter and get usable field crops (closes BASELINE configs 2+3
end to end on the test box)."""

import numpy as np
import jax
import jax.numpy as jnp
from PIL import Image

from twinvoice_tpu.config import Config, InferConfig, TrainConfig, UNetConfig
from twinvoice_tpu.data.dataset import synthetic_dataset
from twinvoice_tpu.infer.pipeline import Segmenter
from twinvoice_tpu.models.unet import unet_apply
from twinvoice_tpu.train import trainer
from twinvoice_tpu.train.metrics import per_class_iou


def test_train_then_serve(tmp_path):
    cfg = Config(
        model=UNetConfig(base_width=8),
        train=TrainConfig(
            batch_size=8, epochs=30, lr=3e-3, visualize=False,
            checkpoint_dir=str(tmp_path / "ckpt"),
        ),
    )
    ds = synthetic_dataset(n=16, size=64, seed=1)
    state, hist = trainer.fit(ds, cfg, log=lambda *_: None)
    assert hist[-1]["loss"] < 0.6 * hist[0]["loss"]  # actually learned

    imgs = jnp.asarray(ds.images, jnp.float32) / 255.0
    masks = jnp.asarray(ds.masks, jnp.float32) / 255.0
    logits, _ = unet_apply(state.params, state.bn_state, imgs, cfg=cfg.model)
    prob = jax.nn.sigmoid(logits)
    iou = per_class_iou(prob > jnp.asarray([0.25, 0.40, 0.30]), masks > 0.5)
    assert float(jnp.mean(iou)) > 0.25, np.asarray(iou)

    # serve the trained weights through the fused inference engine
    seg = Segmenter(state.params, state.bn_state, cfg.model, InferConfig(img_size=64))
    got_crops = 0
    for i in range(4):
        _, crops = seg.segment_pil(Image.fromarray(ds.images[i]))
        got_crops += sum(c is not None for c in crops.values())
    assert got_crops >= 6  # at least half the 12 field crops materialize
