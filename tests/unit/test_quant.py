"""int8 post-training quantization (infer/quant.py): the quantized graph
must track the fp32 folded graph closely enough that thresholded field
masks are near-identical. Gauntlet IoU is the promotion gate; this pins
the numerics at unit level."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from twinvoice_tpu.config import UNetConfig
from twinvoice_tpu.infer.quant import quantize_unet, unet_apply_quantized
from twinvoice_tpu.models.unet import fold_unet, init_unet, unet_apply_folded


@pytest.fixture(scope="module")
def small_model():
    cfg = UNetConfig(base_width=8)
    params, state = init_unet(jax.random.key(0), cfg)
    return fold_unet(params, state, cfg=cfg), cfg


def test_quantized_tracks_fp32(small_model):
    folded, cfg = small_model
    rng = np.random.default_rng(0)
    calib = [rng.integers(0, 255, (2, 64, 64, 3), dtype=np.uint8) for _ in range(2)]
    q = quantize_unet(folded, calib)

    imgs = jnp.asarray(rng.integers(0, 255, (2, 64, 64, 3), dtype=np.uint8))
    ref = unet_apply_folded(folded, imgs.astype(jnp.float32) / 255.0)
    got = unet_apply_quantized(q, imgs)
    assert got.shape == ref.shape and got.dtype == jnp.float32

    # logits agree well in absolute terms...
    mae = float(jnp.mean(jnp.abs(got - ref)))
    ref_std = float(jnp.std(ref))
    assert mae < 0.15 * max(ref_std, 1.0), (mae, ref_std)
    # ...and the downstream decision (sigmoid > t) flips on <2% of pixels
    for t in (0.25, 0.40, 0.30):
        a = jax.nn.sigmoid(ref) > t
        b = jax.nn.sigmoid(got) > t
        assert float(jnp.mean(a != b)) < 0.02


def test_weight_quant_is_per_channel(small_model):
    folded, _ = small_model
    rng = np.random.default_rng(1)
    q = quantize_unet(folded, [rng.integers(0, 255, (1, 64, 64, 3), dtype=np.uint8)])
    w = q["enc"][0]["conv1"]
    assert w["kernel"].dtype == jnp.int8
    assert w["w_scale"].shape == (w["kernel"].shape[-1],)
    assert int(jnp.max(jnp.abs(w["kernel"]))) <= 127


def test_segmenter_int8_mode(small_model):
    from twinvoice_tpu.config import InferConfig
    from twinvoice_tpu.infer.pipeline import Segmenter

    cfg = UNetConfig(base_width=8)
    params, state = init_unet(jax.random.key(2), cfg)
    rng = np.random.default_rng(3)
    calib = [rng.integers(0, 255, (2, 64, 64, 3), dtype=np.uint8)]
    seg = Segmenter(params, state, cfg, InferConfig(img_size=64),
                    dtype=jnp.bfloat16, int8_calib=calib)
    imgs = rng.integers(0, 255, (2, 64, 64, 3), dtype=np.uint8)
    mask, boxes, ok = seg.segment_batch(imgs)
    assert boxes.shape == (2, 3, 4) and mask.shape == (2, 64, 64, 3)
    # raw-resolution (device resize) path also runs quantized
    raw = rng.integers(0, 255, (2, 96, 80, 3), dtype=np.uint8)
    mask2, boxes2, ok2 = seg.segment_batch(raw, pre_resized=False)
    assert boxes2.shape == (2, 3, 4)


def test_segmenter_int8_box_path_matches_logits_path(small_model):
    """With int8_head="pallas", return_masks=False routes through the Pallas
    fused head (ops/pallas_head, interpret mode on CPU); its boxes — incl.
    the bias-folded threshold plumbing at pipeline.py — must match the
    logits-path boxes."""
    from twinvoice_tpu.config import InferConfig
    from twinvoice_tpu.infer.pipeline import Segmenter

    cfg = UNetConfig(base_width=8)
    params, state = init_unet(jax.random.key(5), cfg)
    # random init keeps the reference's -4 background bias -> no detections;
    # push two field channels positive so the box path has work to do
    params["out"]["bias"] = jnp.asarray([2.0, -4.0, 1.0], jnp.float32)
    rng = np.random.default_rng(7)
    calib = [rng.integers(0, 255, (2, 64, 64, 3), dtype=np.uint8)]
    seg = Segmenter(params, state, cfg, InferConfig(img_size=64),
                    dtype=jnp.bfloat16, int8_calib=calib, int8_head="pallas")
    imgs = rng.integers(0, 255, (3, 64, 64, 3), dtype=np.uint8)
    sizes = np.asarray([[640, 480]] * 3, np.int32)

    mask, boxes_ref, ok_ref = seg.segment_batch(imgs, sizes, return_masks=True)
    none_mask, boxes, ok = seg.segment_batch(imgs, sizes, return_masks=False)
    assert none_mask is None
    np.testing.assert_array_equal(np.asarray(ok), np.asarray(ok_ref))
    # bf16 weight rounding in the head can shift a boundary row/col by 1px
    # on the 64-grid -> up to ~1.1*pad in original pixels (640/64 * 1.15)
    diff = np.abs(np.asarray(boxes, np.int64) - np.asarray(boxes_ref, np.int64))
    assert diff[np.asarray(ok_ref)].max() <= 12, diff.max()


def test_concat_and_split_decoders_bit_identical(small_model):
    """quantize_unet harmonizes each skip's requant scale with its paired
    upsample output, which makes the concat-form decoder conv (the XLA
    serving formulation — no s32 HBM round-trip) compute the SAME s32 sums
    as the split form used by the Pallas trunk: outputs must be bit-equal,
    and the harmonized scales must actually match."""
    from twinvoice_tpu.infer.quant import unet_apply_quantized_features

    folded, cfg = small_model
    rng = np.random.default_rng(2)
    calib = [rng.integers(0, 255, (2, 64, 64, 3), dtype=np.uint8)]
    q = quantize_unet(folded, calib)

    for j, uq in enumerate(q["up"]):
        i = len(q["enc"]) - 1 - j
        assert q["enc"][i]["s2"] == uq["s_out"]

    imgs = jnp.asarray(rng.integers(0, 255, (2, 64, 64, 3), dtype=np.uint8))
    h_cat, s_cat = unet_apply_quantized_features(q, imgs, concat=True)
    h_split, s_split = unet_apply_quantized_features(q, imgs, concat=False)
    assert s_cat == s_split
    assert np.array_equal(np.asarray(h_cat), np.asarray(h_split))


def test_segment_pil_batch_gray_h2d_matches_rgb():
    """The luminance-upload path (3× fewer host→device bytes) must produce
    the same boxes as the RGB path on a grayscale-content image — the bulk
    extractor ships with it on by default (FusionConfig.gray_h2d)."""
    from PIL import Image

    from twinvoice_tpu.config import InferConfig
    from twinvoice_tpu.infer.pipeline import Segmenter
    from twinvoice_tpu.models.unet import init_unet

    cfg = UNetConfig(base_width=8)
    params, state = init_unet(jax.random.key(0), cfg)
    seg = Segmenter(params, state, cfg, InferConfig(img_size=64))
    rng = np.random.default_rng(3)
    gray = rng.integers(0, 255, (96, 80), dtype=np.uint8)
    img = Image.fromarray(np.repeat(gray[..., None], 3, -1))
    out_rgb = seg.segment_pil_batch([img], return_masks=False)
    out_gray = seg.segment_pil_batch([img], return_masks=False,
                                     gray_h2d=True)
    assert out_rgb[0][0] is None and out_gray[0][0] is None
    # identical crop presence per field (box math identical on gray input)
    for f in out_rgb[0][1]:
        a, b = out_rgb[0][1][f], out_gray[0][1][f]
        assert (a is None) == (b is None)
        if a is not None:
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
