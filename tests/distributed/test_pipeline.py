"""GPipe pipeline-parallel building block vs sequential ground truth."""

import numpy as np
import jax
import jax.numpy as jnp

from twinvoice_tpu.config import MeshConfig
from jax.sharding import Mesh
from twinvoice_tpu.parallel.pipeline import pipeline_apply, stack_stage_params


def _mesh(n):
    return Mesh(np.asarray(jax.devices("cpu")[:n]), ("stage",))


def test_pipeline_matches_sequential(rng):
    n_stages, n_micro, dim = 4, 6, 16
    keys = jax.random.split(jax.random.key(0), n_stages)
    params_list = [
        {"w": jax.random.normal(k, (dim, dim)) * 0.3, "b": jnp.zeros((dim,))}
        for k in keys
    ]

    def stage_fn(p, x):
        return jnp.tanh(x @ p["w"] + p["b"])

    x = jnp.asarray(rng.standard_normal((n_micro, 2, dim)), jnp.float32)

    seq = x
    for p in params_list:
        seq = jax.vmap(lambda xi: stage_fn(p, xi))(seq)

    mesh = _mesh(n_stages)
    out = pipeline_apply(stage_fn, stack_stage_params(params_list), x, mesh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(seq), atol=1e-5, rtol=1e-5)


def test_pipeline_two_stages(rng):
    params_list = [{"w": jnp.eye(8) * 2.0}, {"w": jnp.eye(8) * 0.5}]

    def stage_fn(p, x):
        return x @ p["w"]

    x = jnp.asarray(rng.standard_normal((3, 8)), jnp.float32)
    out = pipeline_apply(stage_fn, stack_stage_params(params_list), x, _mesh(2))
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)
