"""BatchNorm fast_norm (normalize-in-compute-dtype) semantics."""

import numpy as np
import jax.numpy as jnp



def test_batchnorm_fast_norm_fp32_noop(rng):
    """fast_norm only changes bf16 math; fp32 inputs are bit-identical."""
    from twinvoice_tpu.ops.norm import batchnorm_apply, init_batchnorm

    x = jnp.asarray(rng.standard_normal((2, 8, 8, 4)), jnp.float32)
    p, s = init_batchnorm(4)
    y0, s0 = batchnorm_apply(x, p, s, train=True)
    y1, s1 = batchnorm_apply(x, p, s, train=True, norm_in_compute_dtype=True)
    np.testing.assert_array_equal(np.asarray(y0), np.asarray(y1))
    for k in s0:
        np.testing.assert_array_equal(np.asarray(s0[k]), np.asarray(s1[k]))


def test_batchnorm_fast_norm_bf16_close(rng):
    """bf16 fast normalize stays within bf16 tolerance of the fp32 path,
    and the running stats (always fp32-accumulated) match exactly."""
    from twinvoice_tpu.ops.norm import batchnorm_apply, init_batchnorm

    x = jnp.asarray(rng.standard_normal((2, 8, 8, 4)), jnp.bfloat16)
    p, s = init_batchnorm(4)
    y0, s0 = batchnorm_apply(x, p, s, train=True)
    y1, s1 = batchnorm_apply(x, p, s, train=True, norm_in_compute_dtype=True)
    assert y1.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(y0, np.float32), np.asarray(y1, np.float32),
        atol=0.05, rtol=0.05,
    )
    for k in s0:
        np.testing.assert_allclose(np.asarray(s0[k]), np.asarray(s1[k]),
                                   rtol=1e-6)
