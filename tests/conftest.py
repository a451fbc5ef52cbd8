"""Test harness: force an 8-device virtual CPU mesh so sharding/collective
tests run without a TPU pod (SURVEY.md §4 implication (3))."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("CASMTR_KERNEL_BACKEND", "jnp")

# jax may already be imported by the environment's sitecustomize (which also
# captures JAX_PLATFORMS from the env before we can change it), so force the
# platform through the config API as well.
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
