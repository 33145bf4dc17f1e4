"""Multi-device tests on the 8-way virtual CPU mesh (SURVEY.md §4.4):
data-parallel train step consistency + TP/spatial sharding compile+execute.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from twinvoice_tpu.config import Config, MeshConfig, TrainConfig, UNetConfig
from twinvoice_tpu.core.mesh import batch_sharding, make_mesh, param_shardings
from twinvoice_tpu.models.unet import init_unet
from twinvoice_tpu.train.trainer import (
    TrainState,
    make_optimizer,
    make_train_step,
    shard_train_state,
)

TINY = UNetConfig(base_width=4)
TCFG = TrainConfig(batch_size=8)


def _setup(mesh):
    params, bn = init_unet(jax.random.key(0), TINY)
    opt = make_optimizer(TCFG)
    state = TrainState(params, bn, opt.init(params))
    if mesh is not None:
        state = shard_train_state(state, mesh)
    return state, opt


def _batch(rng):
    x = rng.uniform(0, 1, (8, 32, 32, 3)).astype(np.float32)
    y = (rng.uniform(size=(8, 32, 32, 3)) > 0.8).astype(np.float32)
    return x, y


def _setup_sgd(mesh):
    """SGD variant: the update is linear in the gradient, so DP-vs-single
    param comparison directly verifies grad-psum correctness. (Adam's first
    step is ±lr·sign(g); fp noise on near-zero grads flips signs and makes a
    bitwise comparison meaningless.)"""
    import optax

    params, bn = init_unet(jax.random.key(0), TINY)
    opt = optax.inject_hyperparams(optax.sgd)(learning_rate=1e-3)
    state = TrainState(params, bn, opt.init(params))
    if mesh is not None:
        state = shard_train_state(state, mesh)
    return state, opt


def test_dp8_matches_single_device(rng):
    """Same batch, same init: 8-way DP SGD step must equal the single-device
    step — this is the grad-psum correctness oracle (SURVEY.md §4.4)."""
    x, y = _batch(rng)
    lr = jnp.float32(1e-3)

    state_s, opt = _setup_sgd(None)
    step_s = make_train_step(TINY, TCFG, opt)
    p_s, bn_s, o_s, loss_s = step_s(
        state_s.params, state_s.bn_state, state_s.opt_state,
        jnp.asarray(x), jnp.asarray(y), lr,
    )

    mesh = make_mesh(MeshConfig(data=8), jax.devices("cpu"))
    state_m, opt_m = _setup_sgd(mesh)
    step_m = make_train_step(TINY, TCFG, opt_m, mesh=mesh)
    p_m, bn_m, o_m, loss_m = step_m(
        state_m.params, state_m.bn_state, state_m.opt_state,
        jnp.asarray(x), jnp.asarray(y), lr,
    )

    np.testing.assert_allclose(float(loss_m), float(loss_s), rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree.leaves(p_s), jax.tree.leaves(p_m)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7)
    # BN running stats (updated from global batch stats) must agree too
    for a, b in zip(jax.tree.leaves(bn_s), jax.tree.leaves(bn_m)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_dp8_adamw_step_runs(rng):
    """AdamW DP step: compiles, runs, finite loss, params still sharded."""
    x, y = _batch(rng)
    mesh = make_mesh(MeshConfig(data=8), jax.devices("cpu"))
    state, opt = _setup(mesh)
    step = make_train_step(TINY, TCFG, opt, mesh=mesh)
    p, bn, o, loss = step(
        state.params, state.bn_state, state.opt_state,
        jnp.asarray(x), jnp.asarray(y), jnp.float32(1e-3),
    )
    assert np.isfinite(float(loss))


def test_dp_batch_actually_sharded(rng):
    mesh = make_mesh(MeshConfig(data=8), jax.devices("cpu"))
    x = jax.device_put(jnp.zeros((8, 32, 32, 3)), batch_sharding(mesh))
    assert len(x.sharding.device_set) == 8


def test_tp_spatial_mesh_step_runs(rng):
    """2 data × 2 model × 2 spatial mesh: the full train step compiles and runs
    with channel-sharded params and H-sharded activations (XLA halo exchange)."""
    x, y = _batch(rng)
    mesh = make_mesh(MeshConfig(data=2, model=2, spatial=2), jax.devices("cpu"))
    state, opt = _setup(mesh)
    step = make_train_step(TINY, TCFG, opt, mesh=mesh)
    p, bn, o, loss = step(
        state.params, state.bn_state, state.opt_state,
        jnp.asarray(x), jnp.asarray(y), jnp.float32(1e-3),
    )
    assert np.isfinite(float(loss))

    # compare against single-device ground truth
    state_s, opt_s = _setup(None)
    step_s = make_train_step(TINY, TCFG, opt_s)
    *_, loss_s = step_s(
        state_s.params, state_s.bn_state, state_s.opt_state,
        jnp.asarray(x), jnp.asarray(y), jnp.float32(1e-3),
    )
    np.testing.assert_allclose(float(loss), float(loss_s), rtol=1e-5, atol=1e-6)


def test_param_shardings_channel_rule():
    mesh = make_mesh(MeshConfig(data=2, model=2, spatial=2), jax.devices("cpu"))
    params, _ = init_unet(jax.random.key(0), TINY)
    sh = param_shardings(mesh, params)
    # a wide conv kernel shards its out-channel dim; the 3-channel out conv is replicated
    wide = sh["bottleneck"]["conv1"]["kernel"].spec
    assert wide == jax.sharding.PartitionSpec(None, None, None, "model")
    out = sh["out"]["kernel"].spec
    assert out == jax.sharding.PartitionSpec()
