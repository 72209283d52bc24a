"""Test env: force CPU backend with 8 virtual devices (SURVEY.md §4).

Note: this image ships a sitecustomize (axon TPU plugin) that imports jax at
interpreter startup and pins JAX_PLATFORMS=axon, so plain env vars are too
late — we must override via jax.config before any backend initializes.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
