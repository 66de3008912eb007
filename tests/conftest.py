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

# Persistent compilation cache: model-compile tests (DPT/flow/train-step) pay
# a multi-second XLA compile per jitted program; caching across runs turns the
# second-and-later `pytest` invocations from >10 min into a few minutes.  The
# dir lives in-repo (gitignored) so it survives across sessions.
_CACHE_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np
import pytest


def pytest_collection_modifyitems(config, items):
    """`compileheavy` implies `slow`: the default `-m "not slow"` tier stays
    under 5 minutes, while `-m compileheavy` selects just the compile tier."""
    for item in items:
        if "compileheavy" in item.keywords and "slow" not in item.keywords:
            item.add_marker(pytest.mark.slow)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
