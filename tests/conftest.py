"""Test config: run on CPU with 8 virtual devices so multi-chip sharding
tests work without TPU hardware (the driver separately dry-runs the
multi-chip path; bench.py runs on the real chip).

The container bakes an axon TPU PJRT plugin into every interpreter via a
PYTHONPATH sitecustomize (which also imports jax and pins
JAX_PLATFORMS=axon); with that plugin registered, initializing a
multi-device CPU backend deadlocks on the TPU tunnel. Backends are still
lazy at conftest-import time, so we force CPU through jax.config and drop
the axon factory before anything initializes.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
try:
    import jax._src.xla_bridge as _xb

    _xb._backend_factories.pop("axon", None)
except Exception:
    pass

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
