"""Coverage for the small op/util modules: image resize, precision policy,
serving transpose-conv, device-resize serving path, illumination-robust QR."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from twinvoice_tpu.core.precision import Policy
from twinvoice_tpu.ops.conv import conv_transpose2x2, conv_transpose2x2_serving
from twinvoice_tpu.ops.image import normalize_uint8, resize_bilinear, resize_nearest


def test_resize_bilinear_shapes_and_values():
    x = jnp.ones((2, 8, 8, 3))
    y = resize_bilinear(x, 16, 16)
    assert y.shape == (2, 16, 16, 3)
    np.testing.assert_allclose(np.asarray(y), 1.0, atol=1e-6)
    # unbatched HWC path
    y1 = resize_bilinear(jnp.zeros((8, 8, 1)), 4, 4)
    assert y1.shape == (4, 4, 1)


def test_resize_nearest_preserves_labels():
    x = jnp.zeros((8, 8, 1)).at[0:4].set(7.0)
    y = resize_nearest(x, 4, 4)
    assert set(np.unique(np.asarray(y))) == {0.0, 7.0}


def test_normalize_uint8():
    x = jnp.asarray([[0, 255, 128]], jnp.uint8)
    y = normalize_uint8(x)
    np.testing.assert_allclose(np.asarray(y), [[0.0, 1.0, 128 / 255]], atol=1e-6)


def test_precision_policy():
    fast = Policy.fast()
    parity = Policy.parity()
    p = {"w": jnp.ones((2, 2), jnp.float32)}
    assert fast.cast_params(p)["w"].dtype == jnp.bfloat16
    assert parity.cast_params(p)["w"].dtype == jnp.float32
    assert fast.cast_input(jnp.zeros((2,), jnp.float32)).dtype == jnp.bfloat16


def test_serving_transpose_conv_matches_reference_form(rng):
    from twinvoice_tpu.ops.conv import init_conv_transpose

    p = init_conv_transpose(jax.random.key(3), 12, 6)
    x = jnp.asarray(rng.standard_normal((2, 5, 7, 12)), jnp.float32)
    ref = conv_transpose2x2(x, p)
    got = conv_transpose2x2_serving(x, p)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5, rtol=1e-5)


def test_segment_batch_device_resize_path():
    from twinvoice_tpu.config import InferConfig, UNetConfig
    from twinvoice_tpu.infer.pipeline import Segmenter
    from twinvoice_tpu.models.unet import init_unet

    cfg = UNetConfig(base_width=4)
    params, state = init_unet(jax.random.key(0), cfg)
    seg = Segmenter(params, state, cfg, InferConfig(img_size=32))
    raw = jnp.zeros((1, 60, 80, 3), jnp.uint8)
    mask, boxes, ok = seg.segment_batch(
        raw, jnp.asarray([[80, 60]], jnp.int32), pre_resized=False
    )
    assert mask.shape == (1, 32, 32, 3)
    assert boxes.shape == (1, 3, 4) and ok.shape == (1, 3)


def test_native_qr_low_contrast():
    from twinvoice_tpu.qr import native
    from twinvoice_tpu.qr.encode import render_qr

    if not native.available():
        pytest.skip("native decoder unavailable")
    payload = "AB123456781140909XXYYZZ11223344556677889900"
    img = render_qr(payload, module_px=5, level="M", mask=3).astype(np.float32)
    low = (img * 0.25 + 140).astype(np.uint8)
    assert payload in native.decode(low)
    # illumination gradient
    grad = np.clip(img * np.linspace(0.3, 1.0, img.shape[1])[None, :], 0, 255).astype(np.uint8)
    assert payload in native.decode(grad)


def test_pretrained_variant_registry():
    """Every bundled variant loads into a Segmenter at its training grid."""
    import pytest

    from twinvoice_tpu.models import pretrained

    for name, (fname, mcfg, grid) in pretrained.VARIANTS.items():
        if not pretrained.available(name):
            pytest.skip(f"bundled weights missing: {fname}")
        seg = pretrained.load_pretrained_segmenter(variant=name)
        assert seg.cfg.img_size == grid
        assert seg.model_cfg.base_width == mcfg.base_width
