"""Test configuration: run everything on CPU with 8 virtual devices.

Mirrors the reference's strategy of running one generic suite against every
backend (SURVEY.md §5): here the suites run on CPU (XLA + interpreter-mode
Pallas) with an 8-device virtual mesh to exercise the sharded paths without
TPU hardware.  Must set env vars before jax is imported anywhere.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The axon TPU plugin ignores the JAX_PLATFORMS env var; force via config.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
