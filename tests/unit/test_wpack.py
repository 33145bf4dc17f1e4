"""W-phase-packed serving trunk (infer/wpack): bit-exactness + box parity.

The packed graph computes the SAME int32 conv sums as the concat-form int8
graph (zero taps contribute 0) and mirrors its f32 epilogue op-for-op, so
logits must match BIT-FOR-BIT — any drift means a packing index bug.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from twinvoice_tpu.config import UNetConfig
from twinvoice_tpu.infer.quant import quantize_unet, unet_apply_quantized
from twinvoice_tpu.infer.wpack import (
    conv3x3_pack_out_i8,
    conv3x3_packed_i8,
    conv_transpose2x2_pack_out_i8,
    max_pool2_packed,
    pack_kernel_in_out,
    pack_kernel_out,
    unet_apply_quantized_features_wpack,
    unet_apply_quantized_wpack,
    unet_apply_quantized_wpack_rowcol_max,
    unpack,
)
from twinvoice_tpu.models.unet import fold_unet, init_unet


def _i8(rng, shape):
    return jnp.asarray(rng.integers(-127, 128, shape, dtype=np.int8))


def test_pack_out_conv_bit_exact(rng):
    from twinvoice_tpu.infer.quant import _conv3x3_i8

    x = _i8(rng, (2, 8, 12, 16))
    k = _i8(rng, (3, 3, 16, 8))
    ref = _conv3x3_i8(x, {"kernel": k})
    got = unpack(conv3x3_pack_out_i8(x, pack_kernel_out(k)))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_packed_in_conv_bit_exact(rng):
    from twinvoice_tpu.infer.quant import _conv3x3_i8

    xa = _i8(rng, (2, 8, 12, 8))
    xb = _i8(rng, (2, 8, 12, 8))
    ka = _i8(rng, (3, 3, 8, 8))
    kb = _i8(rng, (3, 3, 8, 8))
    ref = _conv3x3_i8(
        jnp.concatenate([xa, xb], -1),
        {"kernel": jnp.concatenate([ka, kb], 2)},
    )
    # packed inputs: (B,H,P,2C) views of each source
    ta = xa.reshape(2, 8, 6, 16)
    tb = xb.reshape(2, 8, 6, 16)
    got = unpack(
        conv3x3_packed_i8(jnp.concatenate([ta, tb], -1),
                          pack_kernel_in_out([ka, kb]))
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_pack_out_transpose_conv_bit_exact(rng):
    from twinvoice_tpu.infer.quant import _conv_transpose2x2_i8

    x = _i8(rng, (2, 6, 10, 16))
    k = _i8(rng, (2, 2, 16, 8))
    ref = _conv_transpose2x2_i8(x, k)
    got = unpack(conv_transpose2x2_pack_out_i8(x, k))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_max_pool2_packed_matches_unpacked(rng):
    from twinvoice_tpu.ops.conv import max_pool2

    x = _i8(rng, (2, 8, 12, 8))
    t = x.reshape(2, 8, 6, 16)
    np.testing.assert_array_equal(
        np.asarray(max_pool2_packed(t)), np.asarray(max_pool2(x))
    )


@pytest.fixture(scope="module")
def qmodel():
    cfg = UNetConfig(base_width=8)
    params, state = init_unet(jax.random.key(0), cfg)
    folded = fold_unet(params, state, cfg=cfg)
    rng = np.random.default_rng(0)
    calib = [rng.integers(0, 255, (2, 32, 32, 3), dtype=np.uint8)]
    return quantize_unet(folded, calib), rng


def test_wpack_logits_bit_exact(qmodel):
    q, rng = qmodel
    imgs = jnp.asarray(rng.integers(0, 255, (2, 32, 32, 3), dtype=np.uint8))
    ref = unet_apply_quantized(q, imgs, concat=True)
    got = unet_apply_quantized_wpack(q, imgs)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_wpack_rowcol_max_matches_logits(qmodel):
    q, rng = qmodel
    imgs = jnp.asarray(rng.integers(0, 255, (3, 32, 32, 3), dtype=np.uint8))
    logits = np.asarray(unet_apply_quantized(q, imgs, concat=True))
    bias = np.asarray(q["out"]["bias"], np.float32)
    row, col = unet_apply_quantized_wpack_rowcol_max(q, imgs)
    np.testing.assert_allclose(
        np.asarray(row), (logits - bias).max(2), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(col), (logits - bias).max(1), rtol=1e-5, atol=1e-5
    )


def test_wpack_features_shape(qmodel):
    q, rng = qmodel
    imgs = jnp.asarray(rng.integers(0, 255, (2, 32, 32, 3), dtype=np.uint8))
    hp, s = unet_apply_quantized_features_wpack(q, imgs)
    assert hp.shape == (2, 32, 16, 16) and hp.dtype == jnp.int8
    assert s > 0


def test_nhwc_megakernel_trunk_matches_concat_graph(qmodel):
    """The mega-kernel trunk (infer/wpack.unet_apply_quantized_features_nhwc,
    ops/nhwc_conv pair kernels in interpret mode on CPU) must produce the
    same row/col logit maxima as the XLA concat graph — the s32 sums are
    identical; the requant scale constant is computed once in f32 inside
    the kernel vs f64-then-f32 in XLA, so allow a 1-ulp logit tolerance."""
    from twinvoice_tpu.infer.wpack import unet_apply_quantized_nhwc_rowcol_max

    q, rng = qmodel
    imgs = jnp.asarray(rng.integers(0, 255, (2, 32, 32, 3), dtype=np.uint8))
    logits = np.asarray(unet_apply_quantized(q, imgs, concat=True))
    bias = np.asarray(q["out"]["bias"], np.float32)
    row, col = unet_apply_quantized_nhwc_rowcol_max(q, imgs, th=8)
    np.testing.assert_allclose(
        np.asarray(row), (logits - bias).max(2), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(col), (logits - bias).max(1), rtol=1e-4, atol=1e-4
    )
