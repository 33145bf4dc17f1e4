"""Validation split + IoU metrics in the training loop (additions over the
reference, SURVEY.md §4/§5)."""

import numpy as np

from twinvoice_tpu.config import Config, TrainConfig, UNetConfig
from twinvoice_tpu.data.dataset import synthetic_dataset
from twinvoice_tpu.train import trainer


def test_fit_with_val_split(tmp_path):
    ds = synthetic_dataset(n=10, size=32)
    cfg = Config(
        model=UNetConfig(base_width=4),
        train=TrainConfig(
            batch_size=4, epochs=1, val_fraction=0.3, visualize=False,
            checkpoint_dir=str(tmp_path / "c"),
        ),
    )
    state, history = trainer.fit(ds, cfg, log=lambda *_: None)
    rec = history[0]
    assert "val_loss" in rec and np.isfinite(rec["val_loss"])
    assert len(rec["val_iou"]) == 3
    assert all(0.0 <= v <= 1.0 for v in rec["val_iou"])
