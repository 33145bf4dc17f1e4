"""Test harness config: force JAX onto 8 virtual CPU devices.

This is the TPU-idiomatic way to test multi-chip sharding without a cluster
(SURVEY.md §4.4): the host platform is split into 8 devices so Mesh/pjit
paths compile and execute real collectives in-process.

Note: the env-var route (``JAX_PLATFORMS=cpu`` +
``--xla_force_host_platform_device_count``) is ignored when a TPU PJRT plugin
is registered, so we use the config API, which wins regardless.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")  # harmless if a plugin overrides

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
