"""Test harness configuration.

Tests run on a virtual 8-device CPU mesh regardless of what accelerator the
host exposes: sharding logic is validated without TPU hardware, and the
single real chip (when present) is left to the benchmark driver.

The axon sitecustomize pins JAX_PLATFORMS to the TPU plugin before pytest
starts, so plain env vars in this file would be too late for the plugin but
just in time for backend selection: jax.config.update() below overrides the
platform before any backend client is instantiated by the tests.
"""

import os
import pathlib

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

REFERENCE_DIR = pathlib.Path(
    os.environ.get("BJXA_REFERENCE_DIR", "/root/reference")
)
FIXTURE_DIR = REFERENCE_DIR / "test"


@pytest.fixture(scope="session")
def fixture_dir():
    if not FIXTURE_DIR.is_dir():
        pytest.skip("reference fixture corpus not available")
    return FIXTURE_DIR
