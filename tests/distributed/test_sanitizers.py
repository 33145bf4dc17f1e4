"""Donation audits + numeric sanitizers (SURVEY.md §5 'race detection /
sanitizers' row; VERDICT r1 coverage gap).

JAX's functional purity is the race-safety story; what remains auditable
is (a) that the train step really donates its state buffers (no silent
2x memory), and (b) that NaN poisoning is detectable rather than silently
propagated.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _tiny_step():
    from twinvoice_tpu.config import TrainConfig, UNetConfig
    from twinvoice_tpu.models.unet import init_unet
    from twinvoice_tpu.train.trainer import TrainState, make_optimizer, make_train_step

    mcfg = UNetConfig(base_width=8)
    tcfg = TrainConfig(batch_size=2)
    params, bn = init_unet(jax.random.key(0), mcfg)
    opt = make_optimizer(tcfg)
    state = TrainState(params, bn, opt.init(params))
    return make_train_step(mcfg, tcfg, opt), state


def test_train_step_donates_state_buffers():
    step, state = _tiny_step()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (2, 32, 32, 3)), jnp.float32)
    y = jnp.asarray(rng.uniform(size=(2, 32, 32, 3)) > 0.8, jnp.float32)
    old_leaf = jax.tree.leaves(state.params)[0]
    p, b, o, loss = step(state.params, state.bn_state, state.opt_state,
                         x, y, jnp.float32(1e-3))
    assert np.isfinite(float(loss))
    if old_leaf.is_deleted():
        return  # donated, as requested
    pytest.skip("backend does not honor donation (allowed, but audit it)")


def test_nan_poisoning_is_detectable():
    step, state = _tiny_step()
    x = jnp.full((2, 32, 32, 3), jnp.nan, jnp.float32)
    y = jnp.zeros((2, 32, 32, 3), jnp.float32)
    with jax.debug_nans(True):
        with pytest.raises((FloatingPointError, ZeroDivisionError)):
            p, b, o, loss = step(state.params, state.bn_state, state.opt_state,
                                 x, y, jnp.float32(1e-3))
            float(loss)
