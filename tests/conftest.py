"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding is validated without TPU hardware by running XLA's host
platform with 8 virtual devices (the reference's analog is constructing
samplers with explicit (world, rank) values, Spark/sampler.py:70-74, and the
LocalDDP passthrough, Spark/main.py:36-42 — here the *real* sharded code path
runs, just on CPU devices).

Note: this environment's sitecustomize imports jax at interpreter startup, so
env vars are too late here — use jax.config.update, which works any time
before backend initialization.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(42)
