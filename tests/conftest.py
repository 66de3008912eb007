"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding is validated on virtual CPU devices
(xla_force_host_platform_device_count), standing in for a TPU slice — the
pattern recommended for hermetic JAX distributed tests.  Must run before
`import jax` anywhere, hence the env mutation at conftest import time.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
