"""Bulk extraction path: extract_batch must agree with per-image extract."""

import numpy as np
from PIL import Image

from twinvoice_tpu.config import FusionConfig
from twinvoice_tpu.fusion.extract import InvoiceExtractor
from twinvoice_tpu.ocr.fake import FakeOcrEngine


class StubSeg:
    def __init__(self):
        self.single_calls = 0
        self.batch_calls = 0
        img = Image.fromarray(np.full((8, 8, 3), 200, np.uint8))
        self._crops = {"invoice_no": img, "date": img, "total_amount": img}

    def segment_pil(self, im):
        self.single_calls += 1
        return {}, dict(self._crops)

    def segment_pil_batch(self, ims, *, return_masks=True, gray_h2d=False,
                          h2d_chunks=1):
        self.batch_calls += 1
        masks = {} if return_masks else None
        return [(masks, dict(self._crops)) for _ in ims]


class StubQr:
    def __init__(self, payload_for):
        self.payload_for = payload_for

    def scan(self, image):
        return self.payload_for(image)


def _imgs(n):
    rng = np.random.default_rng(0)
    return [
        Image.fromarray(rng.integers(0, 255, (48, 64, 3), dtype=np.uint8))
        for _ in range(n)
    ]


class BatchFake(FakeOcrEngine):
    def read_batch(self, images, modes=None):
        return [self.read(im, mode=m) for im, m in zip(images, modes or ["text"] * len(images))]


def test_extract_batch_matches_single():
    imgs = _imgs(3)
    payloads = {id(imgs[0]): ["AB123456781140909" + "x" * 12],
                id(imgs[1]): [],
                id(imgs[2]): ["XY987654321131231" + "y" * 12, "**珍珠奶茶:2:60:深焙咖啡:1:80"]}
    cfg = FusionConfig(auto_rotate=False)

    def build():
        return InvoiceExtractor(
            StubSeg(), StubQr(lambda im: payloads.get(id(im), [])),
            [BatchFake(lambda im, mode: "140" if mode == "amount" else "CD11223344")],
            cfg=cfg,
        )

    ex1 = build()
    singles = [ex1.extract(im) for im in imgs]
    ex2 = build()
    batch = ex2.extract_batch(imgs)
    for (m1, i1, q1), (m2, i2, q2) in zip(singles, batch):
        m1 = {k: v for k, v in m1.items() if k != "failures"}
        m2 = {k: v for k, v in m2.items() if k != "failures"}
        assert m1 == m2
        assert i1 == i2 and q1 == q2
    assert ex2.segmenter.batch_calls == 1 and ex2.segmenter.single_calls == 0


def test_extract_batch_uses_cache():
    imgs = _imgs(2)
    seg = StubSeg()
    ex = InvoiceExtractor(seg, StubQr(lambda im: []), [BatchFake("77")],
                          cfg=FusionConfig(auto_rotate=False))
    ex.extract(imgs[0])  # warms cache for image 0
    results = ex.extract_batch(imgs)
    assert results[0][0]["total_amount"] == "77"
    assert seg.single_calls == 1 and seg.batch_calls == 1  # only image 1 re-ran


def test_extract_batch_all_cached():
    imgs = _imgs(1)
    seg = StubSeg()
    ex = InvoiceExtractor(seg, StubQr(lambda im: []), [BatchFake("5")],
                          cfg=FusionConfig(auto_rotate=False))
    a = ex.extract(imgs[0])
    b = ex.extract_batch(imgs)[0]
    assert a is b


def test_h2d_chunked_segment_batch_identical():
    """The pipelined (h2d_chunks>1) segmenter path is a pure batch split:
    boxes/crops must match the one-shot path exactly."""
    import jax
    import jax.numpy as jnp

    from tests.torch_oracle import random_state_dict
    from twinvoice_tpu.config import InferConfig, UNetConfig
    from twinvoice_tpu.infer.pipeline import Segmenter
    from twinvoice_tpu.port import port_state_dict

    rng = np.random.default_rng(3)
    sd = random_state_dict(rng, widths=(8, 16, 32, 64))
    sd["out_conv.bias"] = np.asarray([4.0, -4.0, -4.0], np.float32)
    mcfg = UNetConfig(base_width=8)
    params, state = port_state_dict(sd, mcfg)
    seg = Segmenter(params, state, mcfg, InferConfig(img_size=64))

    imgs = [
        Image.fromarray(rng.integers(0, 255, (70 + 3 * i, 50 + 2 * i, 3),
                                     dtype=np.uint8))
        for i in range(5)
    ]
    one = seg.segment_pil_batch(imgs, return_masks=False)
    chunked = seg.segment_pil_batch(imgs, return_masks=False, h2d_chunks=2)
    assert len(one) == len(chunked) == 5
    for (m1, c1), (m2, c2) in zip(one, chunked):
        assert m1 is None and m2 is None
        assert set(c1) == set(c2)
        for f in c1:
            if c1[f] is None:
                assert c2[f] is None
            else:
                np.testing.assert_array_equal(np.asarray(c1[f]),
                                              np.asarray(c2[f]))
