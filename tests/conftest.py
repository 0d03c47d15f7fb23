"""Test harness config.

Tests run on CPU with 8 virtual XLA devices so multi-chip sharding logic is
exercised without TPU hardware (SURVEY.md §4: the TPU-native analogue of a
fake backend).

Note: this image's sitecustomize registers the axon TPU backend at
interpreter start and force-sets ``jax_platforms="axon,cpu"``; env vars are
ignored, so we must override via ``jax.config.update`` before any backend
use.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
