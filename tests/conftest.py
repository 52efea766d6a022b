"""Test configuration.

Tests run on a virtual 8-device CPU mesh (SURVEY.md §4: multi-host tests
via fake-device meshes substitute for the reference's shared-directory
cluster simulation, ``Controller.py:22-32``).

Note: this environment pre-imports jax via sitecustomize, so the platform
must be overridden through ``jax.config`` (still before first backend
use) rather than via JAX_PLATFORMS alone.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
