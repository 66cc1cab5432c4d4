"""Speculative decoding (serving/speculative.py): lossless greedy property
— spec-decode output must be bitwise identical to plain greedy decode —
plus acceptance accounting. Reference has no speculative path (the fused
decode kernel attention_kvcache.cu is the K=1 special case)."""

import jax
import jax.numpy as jnp
import numpy as np

from infinitensor_tpu.models.llama import (
    LlamaConfig, greedy_generate, init_llama_params,
    quantize_llama_params)
from infinitensor_tpu.serving.speculative import (
    ModelDraft, PromptLookupDraft, speculative_generate)


CFG = LlamaConfig(vocab_size=128, dim=64, n_layers=2, n_heads=4,
                  n_kv_heads=2, intermediate=128, max_seq=256)


def _params():
    return init_llama_params(CFG, jax.random.PRNGKey(0))


def _prompt(rng, b=2, s=12):
    return jnp.asarray(rng.integers(1, 128, (b, s)), jnp.int32)


def test_lossless_vs_greedy_prompt_lookup(rng):
    params = _params()
    prompt = _prompt(rng)
    n = 24
    want, _ = greedy_generate(params, CFG, prompt, n)
    got, stats = speculative_generate(params, CFG, prompt, n, K=4,
                                      draft=PromptLookupDraft())
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    assert stats["verify_launches"] <= n   # never slower than greedy


def test_lossless_vs_greedy_self_draft(rng):
    """Same model as draft: high acceptance, so n tokens arrive in well
    under n launches. (Acceptance is not exactly 1.0 even self-drafting:
    the decode-path and verify-path logits differ in the last ulp, and a
    RANDOM-init model produces near-ties that flip argmax — a trained
    model's margins make this negligible.)"""
    params = _params()
    prompt = _prompt(rng)
    n, K = 24, 4
    want, _ = greedy_generate(params, CFG, prompt, n)
    draft = ModelDraft(params, CFG, batch=2, max_seq=256)
    got, stats = speculative_generate(params, CFG, prompt, n, K=K,
                                      draft=draft)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    assert stats["accept_rate"] >= 0.4
    assert stats["tokens_per_launch"] > 1.5   # real speedup over greedy
    assert stats["verify_launches"] < n


def test_output_independent_of_draft(rng):
    """The committed tokens depend only on verify logits over committed
    history — so EVERY draft strategy must emit the identical sequence."""
    params = _params()
    prompt = _prompt(rng)
    n = 20
    outs = []
    for draft in (PromptLookupDraft(),
                  ModelDraft(params, CFG, batch=2, max_seq=256),
                  PromptLookupDraft(ngram=3)):
        got, _ = speculative_generate(params, CFG, prompt, n, K=3,
                                      draft=draft)
        outs.append(np.asarray(got))
    np.testing.assert_array_equal(outs[0], outs[1])
    np.testing.assert_array_equal(outs[0], outs[2])


def test_lossless_vs_greedy_quant_draft(rng):
    """INT4-quantized draft verifying under the fp target — the practical
    self-speculation config (weights already resident)."""
    params = _params()
    qdraft = quantize_llama_params(params, bits=4, group_size=32)
    prompt = _prompt(rng)
    n = 20
    want, _ = greedy_generate(params, CFG, prompt, n)
    draft = ModelDraft(qdraft, CFG, batch=2, max_seq=256)
    got, stats = speculative_generate(params, CFG, prompt, n, K=4,
                                      draft=draft)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    assert 0.0 <= stats["accept_rate"] <= 1.0


def test_prompt_lookup_draft_finds_repeats():
    d = PromptLookupDraft(ngram=2)
    hist = [5, 6, 7, 8, 9, 5, 6]
    # trailing bigram (5, 6) occurred at start; continuation is 7, 8
    assert d.propose(hist, 2) == [7, 8]
    # no match: falls back to repeating the last token
    assert d.propose([1, 2, 3], 2) == [3, 3]
