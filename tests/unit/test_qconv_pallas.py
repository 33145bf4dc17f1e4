"""ops/qconv_pallas frame kernels vs the XLA int8 graph (infer/quant.py).

All Pallas calls run in interpreter mode on CPU (conftest forces cpu);
the integer compute is exact, so everything except the bf16 XLA head
must match the XLA int8 path bit-for-bit.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from twinvoice_tpu.config import UNetConfig
from twinvoice_tpu.infer import quant
from twinvoice_tpu.models.unet import fold_unet, init_unet
from twinvoice_tpu.ops import qconv_pallas as QP


def _rand_s8(rng, shape, lo=-40, hi=41):
    return rng.integers(lo, hi, shape).astype(np.int8)


def _frame_nhwc(x_nhwc):
    """(N,H,W,C) test tensor → zero-bordered (H,C,W,N) frame."""
    return QP.to_frame(jnp.asarray(np.transpose(x_nhwc, (1, 3, 2, 0))))


def _unframe_nhwc(xf):
    return np.transpose(np.asarray(QP.from_frame(xf)), (3, 0, 2, 1))


def _ref_qconv_requant(x_nhwc, k_hwio, a, bias, out_scale, relu=True):
    """Reference: quant._qconv semantics with per-channel dequant ``a``."""
    y = quant._conv3x3_i8(jnp.asarray(x_nhwc), {"kernel": jnp.asarray(k_hwio)})
    y = y.astype(jnp.float32) * jnp.asarray(a) + jnp.asarray(bias)
    if relu:
        y = jax.nn.relu(y)
        return np.asarray(jnp.clip(jnp.round(y * (127.0 / out_scale)), 0, 127
                                   ).astype(jnp.int8))
    return np.asarray(jnp.clip(jnp.round(y * (127.0 / out_scale)), -127, 127
                               ).astype(jnp.int8))


@pytest.mark.parametrize("cin,cout,hw", [(8, 8, 16), (8, 16, 16), (16, 8, 8)])
def test_qconv3x3_requant_matches_xla_int8(rng, cin, cout, hw):
    n = 4
    x = _rand_s8(rng, (n, hw, hw, cin))
    k = _rand_s8(rng, (3, 3, cin, cout), -20, 21)
    a = rng.uniform(1e-3, 2e-3, cout).astype(np.float32)
    bias = rng.normal(0, 0.5, cout).astype(np.float32)
    out_scale = np.float32(3.7)

    ref = _ref_qconv_requant(x, k, a, bias, out_scale)

    cc = QP._plan_tiles(hw, cin, hw, n, cout)[2]
    got = QP.qconv3x3_requant(_frame_nhwc(x), QP.pack_w3x3(k, cc),
                              jnp.asarray(a), jnp.asarray(bias), out_scale,
                              interpret=True)
    np.testing.assert_array_equal(_unframe_nhwc(got), ref)


def test_qconv3x3_chunked_cin_accumulation(rng):
    """Force a multi-chunk Cin split and check exactness of the
    grid-accumulated path."""
    n, hw, cin, cout = 2, 8, 128, 8
    x = _rand_s8(rng, (n, hw, hw, cin), -10, 11)
    k = _rand_s8(rng, (3, 3, cin, cout), -10, 11)
    a = rng.uniform(1e-3, 2e-3, cout).astype(np.float32)
    bias = rng.normal(0, 0.5, cout).astype(np.float32)
    ref = _ref_qconv_requant(x, k, a, bias, np.float32(3.0))
    got = QP.qconv3x3_requant(
        _frame_nhwc(x), QP.pack_w3x3(k, 64), jnp.asarray(a),
        jnp.asarray(bias), np.float32(3.0),
        tiles=(4, 8, 64), interpret=True)
    np.testing.assert_array_equal(_unframe_nhwc(got), ref)


def test_qconv3x3_no_relu_symmetric_requant(rng):
    n, hw, cin, cout = 2, 8, 8, 8
    x = _rand_s8(rng, (n, hw, hw, cin))
    k = _rand_s8(rng, (3, 3, cin, cout), -20, 21)
    a = rng.uniform(1e-3, 2e-3, cout).astype(np.float32)
    bias = rng.normal(0, 0.5, cout).astype(np.float32)
    ref = _ref_qconv_requant(x, k, a, bias, np.float32(2.0), relu=False)
    cc = QP._plan_tiles(hw, cin, hw, n, cout)[2]
    got = QP.qconv3x3_requant(
        _frame_nhwc(x), QP.pack_w3x3(k, cc),
        jnp.asarray(a), jnp.asarray(bias), np.float32(2.0),
        relu=False, interpret=True)
    np.testing.assert_array_equal(_unframe_nhwc(got), ref)


def test_qconv3x3_split_matches_xla_chain(rng):
    """The fused decoder conv1: two inputs at the (harmonized) shared
    scale, both GEMMs accumulated into one s32 scratch."""
    n, hw, c = 2, 16, 8
    up = _rand_s8(rng, (n, hw, hw, c))
    skip = _rand_s8(rng, (n, hw, hw, c))
    k = _rand_s8(rng, (3, 3, 2 * c, c), -20, 21)
    w_scale = rng.uniform(1e-3, 2e-3, c).astype(np.float32)
    bias = rng.normal(0, 0.5, c).astype(np.float32)
    s_cat, s1 = np.float32(0.031), np.float32(4.1)

    # XLA reference (quant.py decoder body with harmonized scales)
    part_up = quant._conv3x3_i8(jnp.asarray(up), {"kernel": jnp.asarray(k[:, :, :c])})
    part_skip = quant._conv3x3_i8(jnp.asarray(skip), {"kernel": jnp.asarray(k[:, :, c:])})
    y = (part_up + part_skip).astype(jnp.float32) * s_cat * w_scale + bias
    ref = np.asarray(quant._requant(jax.nn.relu(y), s1))

    cc = QP._plan_tiles(hw, c, hw, n, c, two_inputs=True)[2]
    got = QP.qconv3x3_split_requant(
        _frame_nhwc(up), _frame_nhwc(skip),
        QP.pack_w3x3(k[:, :, :c], cc), QP.pack_w3x3(k[:, :, c:], cc),
        jnp.asarray(s_cat * w_scale), jnp.asarray(bias), s1, interpret=True)
    np.testing.assert_array_equal(_unframe_nhwc(got), ref)


def test_max_pool2_frame(rng):
    from twinvoice_tpu.ops.conv import max_pool2

    x = _rand_s8(rng, (2, 16, 16, 8))
    ref = np.asarray(max_pool2(jnp.asarray(x)))
    got = QP.max_pool2_hcwn(_frame_nhwc(x), interpret=True)
    np.testing.assert_array_equal(_unframe_nhwc(got), ref)
    # the output frame border must be zero (it feeds the next conv's halo)
    gf = np.asarray(got)
    assert gf[: QP.FH].max() == 0 and gf[-QP.FH:].max() == 0
    assert gf[:, :, : QP.FW].max() == 0 and gf[:, :, -QP.FW:].max() == 0


def test_qupsample2x2_matches_xla(rng):
    n, hw, ci, co = 2, 8, 8, 8
    x = _rand_s8(rng, (n, hw, hw, ci))
    k = _rand_s8(rng, (2, 2, ci, co), -20, 21)
    w_scale = rng.uniform(1e-3, 2e-3, co).astype(np.float32)
    bias = rng.normal(0, 0.3, co).astype(np.float32)
    s, s_out = np.float32(0.021), np.float32(1.9)

    up = quant._conv_transpose2x2_i8(jnp.asarray(x), jnp.asarray(k))
    up = up.astype(jnp.float32) * (s * w_scale) + bias
    ref = np.asarray(jnp.clip(jnp.round(up * (127.0 / s_out)), -127, 127
                              ).astype(jnp.int8))

    got = QP.qupsample2x2_requant(
        _frame_nhwc(x), QP.pack_wup(k),
        jnp.asarray(s * w_scale), jnp.asarray(bias), s_out, interpret=True)
    np.testing.assert_array_equal(_unframe_nhwc(got), ref)


def test_full_pallas_graph_matches_xla_int8_graph(rng):
    """End-to-end: the Pallas-trunk forward's row/col maxima vs the XLA
    int8 logits' maxima. Trunk is integer-exact; only the bf16 head einsum
    differs."""
    cfg = UNetConfig(base_width=8)
    params, state = init_unet(jax.random.key(1), cfg)
    folded = fold_unet(params, state, cfg=cfg)
    calib = [rng.integers(0, 255, (2, 32, 32, 3), dtype=np.uint8)]
    q = quant.quantize_unet(folded, calib)
    pq = quant.prepack_pallas(q, img_size=32, batch=2)

    imgs = jnp.asarray(rng.integers(0, 255, (2, 32, 32, 3), dtype=np.uint8))
    logits = quant.unet_apply_quantized(q, imgs)           # (N,H,W,3) + bias
    bias = np.asarray(q["out"]["bias"])
    row_ref = np.asarray(jnp.max(logits, axis=2)) - bias   # bias-free maxima
    col_ref = np.asarray(jnp.max(logits, axis=1)) - bias

    row, col = quant.unet_apply_quantized_pallas_rowcol_max(q, pq, imgs)
    np.testing.assert_allclose(np.asarray(row), row_ref, rtol=2e-2, atol=5e-2)
    np.testing.assert_allclose(np.asarray(col), col_ref, rtol=2e-2, atol=5e-2)


def test_qconv_dma_matches_blocked(rng):
    """The manually DMA-pipelined conv (perf-experiment kernel) must agree
    bit-for-bit with the blocked frame kernel."""
    n, hw, cin, cout = 2, 16, 8, 8
    x = _rand_s8(rng, (n, hw, hw, cin))
    k = _rand_s8(rng, (3, 3, cin, cout), -20, 21)
    a = rng.uniform(1e-3, 2e-3, cout).astype(np.float32)
    bias = rng.normal(0, 0.5, cout).astype(np.float32)
    xf = _frame_nhwc(x)
    cc = QP._plan_tiles(hw, cin, hw, n, cout)[2]
    ref = QP.qconv3x3_requant(xf, QP.pack_w3x3(k, cc), jnp.asarray(a),
                              jnp.asarray(bias), 3.7, interpret=True)
    for kw in ({}, {"mxu_bf16": True}):
        got = QP.qconv3x3_requant_dma(xf, QP.pack_w3x3(k), jnp.asarray(a),
                                      jnp.asarray(bias), 3.7, interpret=True,
                                      **kw)
        np.testing.assert_array_equal(_unframe_nhwc(got), _unframe_nhwc(ref))
