"""OPT model family tests: prefill/decode agreement, HF parity, quantization
(the reference validates OPT via the distributed launcher parity harness,
reference examples/distributed/cuda/cuda_launch.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from infinitensor_tpu.models.opt import (
    OPTConfig, init_opt_cache, init_opt_params, opt_decode_step, opt_prefill,
    quantize_opt_params,
)


@pytest.fixture(scope="module")
def cfg():
    return OPTConfig.tiny(dtype=jnp.float32)


@pytest.fixture(scope="module")
def params(cfg):
    return init_opt_params(cfg, jax.random.PRNGKey(3), dtype=jnp.float32)


def test_prefill_decode_agree(cfg, params):
    B, S = 2, 8
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, S)), jnp.int32)
    cache = init_opt_cache(cfg, B, dtype=jnp.float32)
    full, _ = opt_prefill(params, cfg, tokens, cache)
    cache = init_opt_cache(cfg, B, dtype=jnp.float32)
    l3, cache = opt_prefill(params, cfg, tokens[:, :3], cache)
    np.testing.assert_allclose(np.asarray(l3), np.asarray(full[:, :3]),
                               rtol=1e-4, atol=1e-4)
    for t in range(3, S):
        pos = jnp.full((B,), t, jnp.int32)
        lg, cache = opt_decode_step(params, cfg, tokens[:, t], pos, cache)
        np.testing.assert_allclose(np.asarray(lg), np.asarray(full[:, t]),
                                   rtol=1e-3, atol=1e-3)


def test_hf_parity():
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    hf_cfg = transformers.OPTConfig(
        vocab_size=128, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, ffn_dim=128, max_position_embeddings=64,
        do_layer_norm_before=True, attn_implementation="eager",
        word_embed_proj_dim=64)
    torch.manual_seed(0)
    hf = transformers.OPTForCausalLM(hf_cfg).eval()

    cfg = OPTConfig(vocab_size=128, dim=64, n_layers=2, n_heads=4,
                    ffn_dim=128, max_seq=64, dtype=jnp.float32)
    from infinitensor_tpu.models.loader import load_opt_params
    params = load_opt_params(hf.state_dict(), cfg, dtype=jnp.float32)

    rng = np.random.default_rng(0)
    tokens = rng.integers(0, 128, (2, 10))
    with torch.no_grad():
        ref = hf(torch.from_numpy(tokens)).logits.numpy()
    cache = init_opt_cache(cfg, 2, dtype=jnp.float32)
    got, _ = opt_prefill(params, cfg, jnp.asarray(tokens, jnp.int32), cache)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-3, atol=1e-3)


def test_quantized_opt(cfg, params):
    qp = quantize_opt_params(params, bits=8, group_size=32)
    tokens = jnp.arange(8, dtype=jnp.int32)[None]
    ref, _ = opt_prefill(params, cfg, tokens,
                         init_opt_cache(cfg, 1, dtype=jnp.float32))
    got, _ = opt_prefill(qp, cfg, tokens,
                         init_opt_cache(cfg, 1, dtype=jnp.float32))
    assert int(jnp.argmax(ref[:, -1])) == int(jnp.argmax(got[:, -1]))
