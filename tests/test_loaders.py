"""Checkpoint loader tests: HF state_dict -> native params, end-to-end
logits parity (completes the 'switch from the reference' user story)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp


def test_llama_loader_parity():
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    from infinitensor_tpu.models.llama import (
        LlamaConfig, init_kv_cache, llama_prefill)
    from infinitensor_tpu.models.loader import load_llama_params

    hf_cfg = transformers.LlamaConfig(
        vocab_size=96, hidden_size=64, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=32, rms_norm_eps=1e-5,
        attn_implementation="eager", tie_word_embeddings=False)
    torch.manual_seed(1)
    hf = transformers.LlamaForCausalLM(hf_cfg).eval()
    cfg = LlamaConfig(vocab_size=96, dim=64, n_layers=2, n_heads=4,
                      n_kv_heads=4, intermediate=64, max_seq=32,
                      dtype=jnp.float32)
    params = load_llama_params(hf.state_dict(), cfg, dtype=jnp.float32)
    tokens = np.random.default_rng(0).integers(0, 96, (1, 8))
    with torch.no_grad():
        ref = hf(torch.from_numpy(tokens)).logits.numpy()
    got, _ = llama_prefill(params, cfg, jnp.asarray(tokens, jnp.int32),
                           init_kv_cache(cfg, 1, dtype=jnp.float32))
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-3, atol=1e-3)


def test_gpt2_loader_parity():
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    from infinitensor_tpu.models.gpt2 import (
        GPT2Config, init_gpt2_cache, gpt2_prefill)
    from infinitensor_tpu.models.loader import load_gpt2_params

    hf_cfg = transformers.GPT2Config(vocab_size=96, n_positions=32,
                                     n_embd=32, n_layer=2, n_head=4,
                                     attn_implementation="eager")
    torch.manual_seed(1)
    hf = transformers.GPT2LMHeadModel(hf_cfg).eval()
    cfg = GPT2Config(vocab_size=96, dim=32, n_layers=2, n_heads=4,
                     max_seq=32, dtype=jnp.float32)
    params = load_gpt2_params(hf.state_dict(), cfg, dtype=jnp.float32)
    tokens = np.random.default_rng(0).integers(0, 96, (1, 8))
    with torch.no_grad():
        ref = hf(torch.from_numpy(tokens)).logits.numpy()
    got, _ = gpt2_prefill(params, cfg, jnp.asarray(tokens, jnp.int32),
                          init_gpt2_cache(cfg, 1, dtype=jnp.float32))
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-3, atol=1e-3)


def test_compilation_cache_helper(tmp_path):
    from infinitensor_tpu.runtime.cache import enable_compilation_cache
    p = enable_compilation_cache(str(tmp_path / "xla"))
    import os
    assert os.path.isdir(p)
