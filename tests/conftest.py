"""Test environment: force the CPU backend with 8 virtual devices so mesh /
sharding tests run without TPU hardware (SURVEY.md §4). Must run before any
jax import."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Pallas kernels are TPU-compiled; tests exercise the jnp reference path.
os.environ.setdefault("VLM_BRIDGE_DISABLE_PALLAS", "1")

import jax  # noqa: E402

# The container image pins JAX_PLATFORMS=axon (TPU tunnel) at import time;
# the env var alone does not win, so force the CPU backend explicitly.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng_np():
    return np.random.default_rng(0)


def assert_close(a, b, atol=2e-4, rtol=2e-4, msg=""):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    np.testing.assert_allclose(a, b, atol=atol, rtol=rtol, err_msg=msg)
