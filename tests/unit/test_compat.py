"""Drop-in compat layer: reference-shaped run_unet backed by the cached
Segmenter (the reference reloads the model per call, inference.py:58)."""

import numpy as np
import torch
import pytest
from PIL import Image

from twinvoice_tpu import compat
from tests.torch_oracle import random_state_dict


@pytest.fixture(scope="module")
def pth_path(tmp_path_factory):
    # reference-schema checkpoint (small widths would not match UNetConfig
    # defaults, so build the full-width schema but tiny spatial input)
    sd = {k: torch.from_numpy(v) for k, v in
          random_state_dict(np.random.default_rng(0), widths=(64, 128, 256, 512), scale=0.02).items()}
    p = tmp_path_factory.mktemp("ckpt") / "best_unet_model.pth"
    torch.save(sd, str(p))
    return str(p)


def test_preprocess_contract():
    img = Image.fromarray(np.full((100, 80, 3), 128, np.uint8))
    x = compat.preprocess(img)
    assert x.shape == (1, 512, 512, 3)
    assert 0.49 < float(x.mean()) < 0.52


def test_run_unet_loads_once(pth_path, monkeypatch):
    from twinvoice_tpu.config import InferConfig

    # full-width model (matches the .pth schema) at a small grid so the CPU
    # test box compiles it quickly; semantics identical to 512
    monkeypatch.setattr(compat, "InferConfig", lambda: InferConfig(img_size=64))
    compat._segmenters.clear()

    img = Image.fromarray(np.full((64, 64, 3), 200, np.uint8))
    masks, crops = compat.run_unet(img, pth_path)
    assert set(masks) == {"invoice_no", "date", "total_amount"}
    assert set(crops) == set(masks)
    seg1 = compat.load_model(pth_path)
    seg2 = compat.load_model(pth_path)
    assert seg1 is seg2  # cached — no per-call reload
