"""Test harness: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated on xla_force_host_platform_device_count=8
CPU devices (real TPU pods are exercised by the bench/driver instead).
Environment must be set before jax is imported anywhere.
"""

import os

# Force CPU: the session environment may preset JAX_PLATFORMS to a real
# accelerator (and may pre-import jax via sitecustomize), so both the env var
# and the config flag are set.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(20260816)
