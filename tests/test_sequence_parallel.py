"""Ring attention + Ulysses tests on the virtual CPU mesh, vs full-attention
oracle (new capability — the reference has no sequence parallelism)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from infinitensor_tpu.kernels.flash_attention import mha_ref
from infinitensor_tpu.parallel.mesh import make_mesh
from infinitensor_tpu.parallel.sequence import ring_attention, ulysses_attention

needs_devices = pytest.mark.skipif(len(jax.devices()) < 4,
                                   reason="needs >=4 devices")


@pytest.fixture
def qkv(rng):
    B, H, S, D = 2, 4, 32, 16
    mk = lambda: jnp.asarray(
        rng.standard_normal((B, H, S, D), dtype=np.float32))
    return mk(), mk(), mk()


@needs_devices
@pytest.mark.parametrize("causal", [True, False])
def test_ring_attention_matches_full(qkv, causal):
    q, k, v = qkv
    mesh = make_mesh({"sp": 4}, jax.devices()[:4])
    ref = mha_ref(q, k, v, causal=causal)
    got = ring_attention(q, k, v, mesh, causal=causal)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


@needs_devices
@pytest.mark.parametrize("causal", [True, False])
def test_ulysses_matches_full(qkv, causal):
    q, k, v = qkv
    mesh = make_mesh({"sp": 4}, jax.devices()[:4])
    ref = mha_ref(q, k, v, causal=causal)
    got = ulysses_attention(q, k, v, mesh, causal=causal)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_flash_attention_cpu_fallback(qkv):
    q, k, v = qkv
    from infinitensor_tpu.kernels.flash_attention import flash_attention
    ref = mha_ref(q, k, v, causal=True)
    got = flash_attention(q, k, v, causal=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-6)
