"""Loss parity vs the torch-computed golden values (train.py:18-59 formulas)."""

import numpy as np
import jax.numpy as jnp

from twinvoice_tpu.config import LossConfig
from twinvoice_tpu.train.losses import dice_loss, focal_loss, invoice_loss
from tests import torch_oracle


def test_invoice_loss_matches_torch(rng):
    logits = rng.standard_normal((2, 3, 16, 16)).astype(np.float32) * 3
    target = (rng.uniform(size=(2, 3, 16, 16)) > 0.7).astype(np.float32)
    golden = torch_oracle.invoice_loss(logits, target)
    got = invoice_loss(
        jnp.asarray(logits.transpose(0, 2, 3, 1)),
        jnp.asarray(target.transpose(0, 2, 3, 1)),
        LossConfig(),
    )
    np.testing.assert_allclose(float(got), golden, rtol=1e-5, atol=1e-6)


def test_dice_perfect_prediction_is_near_zero():
    t = jnp.zeros((1, 8, 8, 3)).at[:, 2:6, 2:6, :].set(1.0)
    assert float(dice_loss(t, t)) < 0.01


def test_dice_empty_pred_and_target_uses_smooth():
    z = jnp.zeros((1, 8, 8, 3))
    # (2·0+1)/(0+1) = 1 → loss 0: smooth term keeps empty/empty at zero loss
    assert abs(float(dice_loss(z, z))) < 1e-6


def test_focal_downweights_easy_examples():
    t = jnp.ones((1, 4, 4, 1))
    easy = jnp.full((1, 4, 4, 1), 0.99)
    hard = jnp.full((1, 4, 4, 1), 0.6)
    assert float(focal_loss(easy, t)) < float(focal_loss(hard, t))


def test_loss_weights_configurable():
    logits = jnp.zeros((1, 4, 4, 3))
    t = jnp.zeros((1, 4, 4, 3))
    only_dice = invoice_loss(logits, t, LossConfig(dice_weight=1.0, focal_weight=0.0))
    only_focal = invoice_loss(logits, t, LossConfig(dice_weight=0.0, focal_weight=1.0))
    full = invoice_loss(logits, t, LossConfig())
    np.testing.assert_allclose(
        float(full), 0.85 * float(only_dice) + 0.15 * float(only_focal), rtol=1e-6
    )
