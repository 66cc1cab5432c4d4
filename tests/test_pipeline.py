"""Pipeline-parallel tests: GPipe schedule parity vs plain prefill
(new capability; the reference has no PP)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from infinitensor_tpu.models.llama import (
    LlamaConfig, init_llama_params, init_kv_cache, llama_prefill,
)
from infinitensor_tpu.parallel.mesh import make_mesh
from infinitensor_tpu.parallel.pipeline import (
    llama_pipeline_prefill, pipeline_apply, stack_stage_params,
)

needs_devices = pytest.mark.skipif(len(jax.devices()) < 4,
                                   reason="needs >=4 devices")


@needs_devices
def test_generic_pipeline_identity_chain(rng):
    """4-stage pipeline of elementwise layers == sequential application."""
    mesh = make_mesh({"pp": 4}, jax.devices()[:4])
    layers = [{"w": jnp.asarray(rng.standard_normal((8,), dtype=np.float32))}
              for _ in range(8)]
    stacked = stack_stage_params(layers, 4)
    x = jnp.asarray(rng.standard_normal((8, 8), dtype=np.float32))

    def stage_fn(stage_layers, h):
        for i in range(stage_layers["w"].shape[0]):
            h = jnp.tanh(h * stage_layers["w"][i])
        return h

    got = pipeline_apply(stage_fn, stacked, x, n_micro=4, mesh=mesh)
    ref = x
    for layer in layers:
        ref = jnp.tanh(ref * layer["w"])
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-6)


@needs_devices
def test_llama_pipeline_prefill_parity():
    cfg = LlamaConfig(vocab_size=128, dim=64, n_layers=4, n_heads=4,
                      n_kv_heads=2, intermediate=96, max_seq=16,
                      dtype=jnp.float32)
    params = init_llama_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    rng = np.random.default_rng(0)
    B, S = 4, 8
    tokens = jnp.asarray(rng.integers(0, 128, (B, S)), jnp.int32)
    cache = init_kv_cache(cfg, B, dtype=jnp.float32)
    ref, _ = llama_prefill(params, cfg, tokens, cache)
    mesh = make_mesh({"pp": 4}, jax.devices()[:4])
    got = llama_pipeline_prefill(params, cfg, tokens, mesh, n_micro=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


@needs_devices
def test_moe_expert_parallel_parity(rng):
    from infinitensor_tpu.models.moe import (
        init_moe_params, moe_ffn_ref, moe_ffn_ep)
    params = init_moe_params(jax.random.PRNGKey(0), dim=16, hidden=32,
                             n_experts=8)
    x = jnp.asarray(rng.standard_normal((24, 16), dtype=np.float32))
    ref = moe_ffn_ref(params, x, top_k=2)
    mesh = make_mesh({"ep": 4}, jax.devices()[:4])
    got = moe_ffn_ep(params, x, mesh, top_k=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
