"""Test harness: force CPU with 8 virtual devices so sharding/pjit paths are
exercised without TPU hardware (the reference had no hardware-free
distributed test story at all — SURVEY.md section 4)."""
import os

# The sandbox's sitecustomize imports jax at interpreter startup with the
# axon (remote-TPU) platform, so JAX_PLATFORMS env edits are too late here;
# jax.config.update is the reliable override. XLA_FLAGS is still read at
# backend-init time, which has not happened yet.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return jax.random.PRNGKey(0)


@pytest.fixture
def np_rng():
    return np.random.default_rng(0)
