"""Test harness: force CPU with a virtual 8-device mesh so sharding tests run
without TPU hardware (SURVEY section 4's multi-chip test strategy).

Note: the runtime environment preloads jax at interpreter startup (sitecustomize),
so env vars alone are too late — we must also flip jax.config, which works
because backends initialize lazily on first use."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
