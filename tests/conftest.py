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

# Modules dominated by multi-second compiles (HF parity, derivation
# search, interpreted Pallas bodies, subprocess tests). The core loop is
# `pytest -m "not slow"` (~2 min); CI runs everything.
_SLOW_MODULES = {
    "test_nnet_derivator", "test_ppl_gate", "test_optimizer",
    "test_multiprocess", "test_paged_cache", "test_gpt2", "test_bert",
    "test_watchdog", "test_llama", "test_derivation_search",
    "test_onnx_sweep", "test_pallas_interpret", "test_vision_models",
    "test_loaders", "test_serving_speculative", "test_scaling_audit",
}


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: compile-heavy tests excluded from the quick "
        "loop (run with -m 'not slow')")


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.module.__name__ in _SLOW_MODULES:
            item.add_marker(pytest.mark.slow)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
