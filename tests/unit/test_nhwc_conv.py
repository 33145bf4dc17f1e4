"""NHWC mega-kernel (ops/nhwc_conv): bit-exactness vs the XLA int8 graph.

Interpret mode on CPU; the TPU throughput measurement lives in
scripts/nhwc_conv_probe.py / docs/PERFORMANCE.md.
"""

import numpy as np
import jax
import jax.numpy as jnp

from twinvoice_tpu.infer.quant import _conv3x3_i8, _requant
from twinvoice_tpu.ops.nhwc_conv import pad_nhwc, qconv3x3_nhwc_requant


def _ref(x, k, a, bias, os_, relu=True):
    y = _conv3x3_i8(x, {"kernel": k}).astype(jnp.float32) * a + bias
    if relu:
        return _requant(jax.nn.relu(y), os_)
    return jnp.clip(jnp.round(y * (127.0 / os_)), -127, 127).astype(jnp.int8)


def test_qconv3x3_nhwc_bit_exact(rng):
    b, h, w, c, co = 2, 16, 24, 16, 8
    x = jnp.asarray(rng.integers(0, 127, (b, h, w, c), dtype=np.int8))
    k = jnp.asarray(rng.integers(-127, 128, (3, 3, c, co), dtype=np.int8))
    a = jnp.asarray(rng.uniform(1e-3, 2e-3, (co,)), jnp.float32)
    bias = jnp.asarray(rng.normal(0, 0.1, (co,)), jnp.float32)
    os_ = jnp.float32(0.7)

    ref = _ref(x, k, a, bias, os_)
    got = qconv3x3_nhwc_requant(pad_nhwc(x), k, a, bias, os_, th=8)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_qconv3x3_nhwc_no_relu_and_odd_blocks(rng):
    b, h, w, c, co = 1, 24, 16, 8, 8
    x = jnp.asarray(rng.integers(-127, 128, (b, h, w, c), dtype=np.int8))
    k = jnp.asarray(rng.integers(-127, 128, (3, 3, c, co), dtype=np.int8))
    a = jnp.asarray(rng.uniform(1e-3, 2e-3, (co,)), jnp.float32)
    bias = jnp.asarray(rng.normal(0, 0.1, (co,)), jnp.float32)
    os_ = jnp.float32(1.3)

    ref = _ref(x, k, a, bias, os_, relu=False)
    got = qconv3x3_nhwc_requant(pad_nhwc(x), k, a, bias, os_, relu=False,
                                th=8)  # 3 blocks: odd drain path
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def _mk(rng, b, h, w, c, co, lo=0):
    x = jnp.asarray(rng.integers(lo, 127, (b, h, w, c), dtype=np.int8))
    k = jnp.asarray(rng.integers(-127, 128, (3, 3, c, co), dtype=np.int8))
    a = jnp.asarray(rng.uniform(1e-3, 2e-3, (co,)), jnp.float32)
    bias = jnp.asarray(rng.normal(0, 0.1, (co,)), jnp.float32)
    return x, k, a, bias


def test_pair_kernel_a_to_b_bit_exact(rng):
    from twinvoice_tpu.ops.nhwc_conv import (
        from_phase_b, pack_w_pair, qconv3x3_pair_requant, to_phase_a,
    )

    b, h, w, c, co = 2, 32, 24, 16, 8
    x, k, a, bias = _mk(rng, b, h, w, c, co)
    os_ = jnp.float32(0.9)
    ref = _ref(x, k, a, bias, os_)
    got = qconv3x3_pair_requant(
        to_phase_a(x), jnp.asarray(pack_w_pair(k)),
        jnp.tile(a, 2), jnp.tile(bias, 2), os_, in_phase="A", th=8,
    )
    np.testing.assert_array_equal(np.asarray(from_phase_b(got)),
                                  np.asarray(ref))


def test_pair_kernel_b_to_a_bit_exact(rng):
    from twinvoice_tpu.ops.nhwc_conv import (
        pack_w_pair, qconv3x3_pair_requant, to_phase_a,
    )

    b, h, w, c, co = 1, 24, 16, 8, 8
    x, k, a, bias = _mk(rng, b, h, w, c, co)
    os_ = jnp.float32(1.1)
    ref = _ref(x, k, a, bias, os_)
    xb = x.reshape(b, h, w // 2, 2 * c)  # natural pairs = phase B
    got = qconv3x3_pair_requant(
        xb, jnp.asarray(pack_w_pair(k)),
        jnp.tile(a, 2), jnp.tile(bias, 2), os_, in_phase="B", th=8,
    )
    np.testing.assert_array_equal(np.asarray(got),
                                  np.asarray(to_phase_a(ref)))


def test_pair_kernel_phase_chain(rng):
    """conv (A→B) then conv (B→A) chained with ZERO relayout between —
    matches two XLA convs."""
    from twinvoice_tpu.ops.nhwc_conv import (
        pack_w_pair, qconv3x3_pair_requant, to_phase_a,
    )

    b, h, w, c = 1, 16, 16, 8
    x, k1, a1, b1 = _mk(rng, b, h, w, c, c)
    _, k2, a2, b2 = _mk(rng, b, h, w, c, c)
    s1, s2 = jnp.float32(0.8), jnp.float32(1.2)

    ref1 = _ref(x, k1, a1, b1, s1)
    ref2 = _ref(ref1, k2, a2, b2, s2)

    t1 = qconv3x3_pair_requant(
        to_phase_a(x), jnp.asarray(pack_w_pair(k1)),
        jnp.tile(a1, 2), jnp.tile(b1, 2), s1, in_phase="A", th=8)
    t2 = qconv3x3_pair_requant(
        t1, jnp.asarray(pack_w_pair(k2)),
        jnp.tile(a2, 2), jnp.tile(b2, 2), s2, in_phase="B", th=8)
    np.testing.assert_array_equal(np.asarray(t2),
                                  np.asarray(to_phase_a(ref2)))
