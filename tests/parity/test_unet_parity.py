"""BASELINE config 1: JAX U-Net forward matches the torch reference at fp32.

Oracle = functional torch forward (tests/torch_oracle.py) on a random
reference-schema state_dict; DUT = ported params through unet_apply /
unet_apply_folded. Checks logits closeness and exact mask agreement at the
reference thresholds (inference.py:75-79).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from twinvoice_tpu.config import UNetConfig
from twinvoice_tpu.models import (
    init_unet,
    unet_apply,
    fold_unet,
    unet_apply_folded,
    param_count,
)
from twinvoice_tpu.port import port_state_dict, export_state_dict

from tests import torch_oracle


# Narrow widths keep CPU compile time small; the code paths (conv, BN,
# transpose-conv, concat order, porting transposes) are identical to full width.
WIDTHS = (8, 16, 32, 64)
CFG = UNetConfig(base_width=8)


@pytest.fixture(scope="module")
def sd():
    return torch_oracle.random_state_dict(np.random.default_rng(42), widths=WIDTHS)


@pytest.fixture(scope="module")
def x(sd):
    rng = np.random.default_rng(7)
    return rng.uniform(0, 1, (2, 3, 32, 32)).astype(np.float32)  # NCHW for oracle


def test_param_count_matches_reference():
    params, _ = init_unet(jax.random.key(0))
    assert param_count(params) == 31_043_651  # SURVEY.md §0 checkpoint identity


def test_forward_parity_eval(sd, x):
    golden = torch_oracle.forward(sd, x, train=False)  # (N,3,H,W)
    params, state = port_state_dict(sd, CFG)
    logits, _ = unet_apply(params, state, jnp.asarray(x.transpose(0, 2, 3, 1)), cfg=CFG, train=False)
    got = np.asarray(logits).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, golden, atol=2e-4, rtol=1e-4)
    # exact mask agreement at the reference per-field thresholds
    prob_g = 1 / (1 + np.exp(-golden))
    prob_j = 1 / (1 + np.exp(-got))
    for c, thr in enumerate((0.25, 0.40, 0.30)):
        np.testing.assert_array_equal(prob_j[:, c] > thr, prob_g[:, c] > thr)


def test_forward_parity_train_mode(sd, x):
    """Train-mode BN (batch stats) must also match the oracle."""
    golden = torch_oracle.forward(sd, x, train=True)
    params, state = port_state_dict(sd, CFG)
    logits, new_state = unet_apply(
        params, state, jnp.asarray(x.transpose(0, 2, 3, 1)), cfg=CFG, train=True
    )
    got = np.asarray(logits).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, golden, atol=5e-4, rtol=1e-3)
    # running stats must have moved
    before = state["enc"][0]["bn1"]["mean"]
    after = new_state["enc"][0]["bn1"]["mean"]
    assert not np.allclose(np.asarray(before), np.asarray(after))


def test_folded_matches_unfolded(sd, x):
    params, state = port_state_dict(sd, CFG)
    xj = jnp.asarray(x.transpose(0, 2, 3, 1))
    ref, _ = unet_apply(params, state, xj, cfg=CFG, train=False)
    folded = fold_unet(params, state, cfg=CFG)
    got = unet_apply_folded(folded, xj)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4, rtol=1e-4)


def test_port_roundtrip(sd):
    params, state = port_state_dict(sd, CFG)
    back = export_state_dict(params, state, CFG)
    assert set(back) == {k for k in sd}
    for k in sd:
        np.testing.assert_array_equal(back[k], np.asarray(sd[k], np.float32))


def test_running_stat_update_matches_torch(sd, x):
    """One train-mode pass: running mean/var update must match torch exactly
    (biased var for normalization, unbiased for the running update)."""
    import torch
    import torch.nn.functional as F

    params, state = port_state_dict(sd, CFG)
    _, new_state = unet_apply(params, state, jnp.asarray(x.transpose(0, 2, 3, 1)), cfg=CFG, train=True)

    rm = torch.from_numpy(sd["down1.net.1.running_mean"].copy())
    rv = torch.from_numpy(sd["down1.net.1.running_var"].copy())
    xt = torch.from_numpy(x)
    with torch.no_grad():
        h = F.conv2d(
            xt,
            torch.from_numpy(sd["down1.net.0.weight"]),
            torch.from_numpy(sd["down1.net.0.bias"]),
            padding=1,
        )
        F.batch_norm(
            h, rm, rv,
            torch.from_numpy(sd["down1.net.1.weight"]),
            torch.from_numpy(sd["down1.net.1.bias"]),
            training=True, momentum=0.1, eps=1e-5,
        )
    np.testing.assert_allclose(
        np.asarray(new_state["enc"][0]["bn1"]["mean"]), rm.numpy(), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(new_state["enc"][0]["bn1"]["var"]), rv.numpy(), atol=1e-5, rtol=1e-5
    )
