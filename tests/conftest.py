"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding is validated on virtual CPU devices, standing in for a
TPU slice.  Two quirks of this environment:
  * a sitecustomize (axon TPU tunnel) force-selects the 'axon' platform via
    jax config, overriding the JAX_PLATFORMS env var — so we override the
    CONFIG after import, not just the env;
  * XLA_FLAGS must carry the host-device count before the backend
    initializes, hence the env mutation at conftest import time.
"""

import os

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
