"""Accuracy-gate harness tests (tools/ppl_gate.py).

Mirrors the reference's accuracy gating idea (token-mismatch count vs a
higher-precision oracle, examples/python/llama_kvcache_inference.py:102-144)
as a perplexity-delta gate per BASELINE.md."""
import jax
import jax.numpy as jnp
import pytest

from infinitensor_tpu.models.llama import (
    LlamaConfig, init_llama_params, quantize_llama_params)

import importlib.util
import os

_spec = importlib.util.spec_from_file_location(
    "ppl_gate", os.path.join(os.path.dirname(__file__), "..", "tools",
                             "ppl_gate.py"))
ppl_gate = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(ppl_gate)


@pytest.fixture(scope="module")
def setup():
    cfg = LlamaConfig(vocab_size=128, dim=64, n_layers=2, n_heads=4,
                      n_kv_heads=2, intermediate=128, max_seq=40)
    params = init_llama_params(cfg, jax.random.PRNGKey(0),
                               dtype=jnp.float32)
    toks = ppl_gate.sample_text(params, cfg, jax.random.PRNGKey(1),
                                batch=2, length=32)
    return cfg, params, toks


def test_selfsampled_ppl_below_uniform(setup):
    cfg, params, toks = setup
    ppl = ppl_gate.perplexity(params, cfg, toks, jnp.float32)
    assert 1.0 < ppl < cfg.vocab_size  # better than uniform over vocab


def test_quant_ppl_ordering(setup):
    """fp32 <= int8 <= int4 perplexity (quant error is monotone in bits)."""
    cfg, params, toks = setup
    p32 = ppl_gate.perplexity(params, cfg, toks, jnp.float32)
    p8 = ppl_gate.perplexity(quantize_llama_params(params, bits=8),
                             cfg, toks, jnp.float32)
    p4 = ppl_gate.perplexity(
        quantize_llama_params(params, bits=4, group_size=32),
        cfg, toks, jnp.float32)
    assert p32 <= p8 * 1.001  # int8 may tie within noise
    assert p8 < p4
    assert (p8 - p32) / p32 < 0.02  # int8 relative gate at toy scale


def test_streaming_seeded_matches_whole_model(setup):
    """The 7B streaming evaluator (seeded per-layer regeneration) must
    match whole-model perplexity on identical weights at toy scale."""
    import numpy as np
    cfg = LlamaConfig(vocab_size=128, dim=64, n_layers=2, n_heads=4,
                      n_kv_heads=2, intermediate=128, max_seq=40)
    kp = jax.random.PRNGKey(3)
    params = init_llama_params(cfg, kp, dtype=jnp.bfloat16)
    toks = np.asarray(ppl_gate.sample_text(
        params, cfg, jax.random.PRNGKey(4), batch=2, length=32,
        cache_dtype=jnp.bfloat16))
    want = ppl_gate.perplexity(params, cfg, jnp.asarray(toks), jnp.bfloat16)
    got = ppl_gate.perplexity_streaming_seeded(kp, cfg, toks)
    assert abs(want - got) / want < 0.02
    # quantized + control variants produce finite, ordered-ish results
    g8 = ppl_gate.perplexity_streaming_seeded(kp, cfg, toks, bits=8,
                                              group=64)
    g4 = ppl_gate.perplexity_streaming_seeded(kp, cfg, toks, bits=4,
                                              group=32)
    c4 = ppl_gate.perplexity_streaming_seeded(kp, cfg, toks,
                                              bits="control4", group=32)
    assert all(v > 0 for v in (g8, g4, c4))
    assert abs(g8 - got) <= abs(g4 - got) + 1e-3
