"""Speculative continuous batching: ServingEngine(spec_decode=K) runs one
fused K-token verify per step, per-slot ragged acceptance. Emissions are
defined by the verify logits over committed history, so they are identical
for any K and any draft."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from infinitensor_tpu.models.llama import LlamaConfig, init_llama_params
from infinitensor_tpu.serving import ServingEngine


CFG = LlamaConfig(vocab_size=128, dim=64, n_layers=2, n_heads=4,
                  n_kv_heads=2, intermediate=128, max_seq=256)


@pytest.fixture(scope="module")
def params():
    return init_llama_params(CFG, jax.random.PRNGKey(0))


def _run(eng, reqs):
    rs = [eng.submit(p, max_new_tokens=m) for p, m in reqs]
    eng.run_to_completion()
    assert all(r.done for r in rs)
    return [r.generated for r in rs]


def test_spec_engine_emissions_independent_of_k(params, rng):
    reqs = [(list(rng.integers(1, 128, int(p))), int(m))
            for p, m in zip(rng.integers(4, 20, 6), rng.integers(6, 14, 6))]
    outs = {}
    for K in (2, 4):
        eng = ServingEngine(params, CFG, max_slots=3, prefill_buckets=(24,),
                            spec_decode=K)
        outs[K] = _run(eng, reqs)
    assert outs[2] == outs[4]


def test_spec_engine_amortizes_steps(params, rng):
    reqs = [(list(rng.integers(1, 128, 8)), 16) for _ in range(4)]
    eng = ServingEngine(params, CFG, max_slots=4, prefill_buckets=(8,),
                        spec_decode=4)
    outs = _run(eng, reqs)
    assert all(len(o) == 16 for o in outs)
    # every step emits >= 1 token per live slot
    assert eng.steps <= eng.tokens_out
    assert eng.steps < 4 * 16          # strictly fewer launches than greedy


def test_spec_engine_rejects_foreign_family_without_verify(params):
    from infinitensor_tpu.models.gpt2 import (
        GPT2Config, gpt2_decode_step, gpt2_prefill, init_gpt2_cache)
    gcfg = GPT2Config(vocab_size=128, dim=64, n_layers=1, n_heads=2,
                      max_seq=64)
    with pytest.raises(ValueError, match="verify_fn"):
        ServingEngine(params, gcfg, max_slots=2, spec_decode=4,
                      prefill_fn=gpt2_prefill, decode_fn=gpt2_decode_step,
                      init_cache_fn=init_gpt2_cache)


def test_spec_engine_int8_kv(params, rng):
    reqs = [(list(rng.integers(1, 128, 10)), 8) for _ in range(3)]
    eng = ServingEngine(params, CFG, max_slots=3, prefill_buckets=(16,),
                        spec_decode=3, kv_quant=True)
    outs = _run(eng, reqs)
    assert all(len(o) == 8 for o in outs)
