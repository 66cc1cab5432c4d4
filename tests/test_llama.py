"""Llama model tests: HF-transformers parity (the analog of the reference's
llama_kvcache_inference.py comparing vs HF PyTorch), prefill/decode
consistency, quantization accuracy."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from infinitensor_tpu.models.llama import (
    LlamaConfig, init_llama_params, quantize_llama_params, llama_prefill,
    llama_decode_step, init_kv_cache, greedy_generate,
)


@pytest.fixture(scope="module")
def tiny_cfg():
    return LlamaConfig.tiny(dtype=jnp.float32)


@pytest.fixture(scope="module")
def tiny_params(tiny_cfg):
    return init_llama_params(tiny_cfg, jax.random.PRNGKey(0),
                             dtype=jnp.float32)


def test_prefill_shapes(tiny_cfg, tiny_params):
    B, S = 2, 8
    cache = init_kv_cache(tiny_cfg, B, dtype=jnp.float32)
    tokens = jnp.arange(B * S, dtype=jnp.int32).reshape(B, S) % 100
    logits, cache2 = llama_prefill(tiny_params, tiny_cfg, tokens, cache)
    assert logits.shape == (B, S, tiny_cfg.vocab_size)
    assert len(cache2["k"]) == tiny_cfg.n_layers
    assert cache2["k"][0].shape == cache["k"][0].shape
    # cache written for positions < S, untouched after
    assert np.abs(np.asarray(cache2["k"][0][:, :, S:])).max() == 0
    assert np.abs(np.asarray(cache2["k"][0][:, :, :S])).max() > 0


def test_decode_matches_prefill(tiny_cfg, tiny_params):
    """Token-by-token decode must reproduce full-sequence prefill logits."""
    B, S = 1, 6
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(0, 100, (B, S)), jnp.int32)
    cache = init_kv_cache(tiny_cfg, B, dtype=jnp.float32)
    full_logits, _ = llama_prefill(tiny_params, tiny_cfg, tokens, cache)

    # prefill first 3, then decode the rest one token at a time
    cache = init_kv_cache(tiny_cfg, B, dtype=jnp.float32)
    logits3, cache = llama_prefill(tiny_params, tiny_cfg, tokens[:, :3], cache)
    np.testing.assert_allclose(np.asarray(logits3),
                               np.asarray(full_logits[:, :3]), rtol=2e-4,
                               atol=2e-4)
    for t in range(3, S):
        pos = jnp.full((B,), t, jnp.int32)
        step_logits, cache = llama_decode_step(
            tiny_params, tiny_cfg, tokens[:, t], pos, cache)
        np.testing.assert_allclose(np.asarray(step_logits),
                                   np.asarray(full_logits[:, t]),
                                   rtol=2e-4, atol=2e-4)


def test_greedy_generate_runs(tiny_cfg, tiny_params):
    out, cache = greedy_generate(tiny_params, tiny_cfg,
                                 jnp.ones((2, 4), jnp.int32), n_steps=5)
    assert out.shape == (2, 5)
    assert out.dtype == jnp.int32


def test_hf_transformers_parity():
    """Logits parity vs HuggingFace LlamaForCausalLM with converted weights
    (reference accuracy harness: examples/python/llama_kvcache_inference.py
    compares vs HF with rtol/atol 1e-3)."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")

    hf_cfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, rms_norm_eps=1e-5, rope_theta=10000.0,
        attn_implementation="eager", tie_word_embeddings=False)
    torch.manual_seed(0)
    hf = transformers.LlamaForCausalLM(hf_cfg).eval()

    cfg = LlamaConfig(vocab_size=128, dim=64, n_layers=2, n_heads=4,
                      n_kv_heads=2, intermediate=128, max_seq=64,
                      norm_eps=1e-5, dtype=jnp.float32)

    def t2j(t):
        return jnp.asarray(t.detach().numpy())

    sd = hf.state_dict()
    layers = []
    for i in range(cfg.n_layers):
        p = f"model.layers.{i}."
        layers.append({
            "attn_norm": t2j(sd[p + "input_layernorm.weight"]),
            "wq": t2j(sd[p + "self_attn.q_proj.weight"]).T,
            "wk": t2j(sd[p + "self_attn.k_proj.weight"]).T,
            "wv": t2j(sd[p + "self_attn.v_proj.weight"]).T,
            "wo": t2j(sd[p + "self_attn.o_proj.weight"]).T,
            "mlp_norm": t2j(sd[p + "post_attention_layernorm.weight"]),
            "w_gate": t2j(sd[p + "mlp.gate_proj.weight"]).T,
            "w_up": t2j(sd[p + "mlp.up_proj.weight"]).T,
            "w_down": t2j(sd[p + "mlp.down_proj.weight"]).T,
        })
    params = {
        "embed": t2j(sd["model.embed_tokens.weight"]),
        "final_norm": t2j(sd["model.norm.weight"]),
        "lm_head": t2j(sd["lm_head.weight"]).T,
        "layers": layers,
    }

    rng = np.random.default_rng(0)
    tokens = rng.integers(0, 128, (2, 10))
    with torch.no_grad():
        ref = hf(torch.from_numpy(tokens)).logits.numpy()

    cache = init_kv_cache(cfg, 2, dtype=jnp.float32)
    got, _ = llama_prefill(params, cfg, jnp.asarray(tokens, jnp.int32), cache)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-3, atol=1e-3)


def test_quantized_params_close(tiny_cfg, tiny_params):
    qp8 = quantize_llama_params(tiny_params, bits=8, group_size=32)
    qp4 = quantize_llama_params(tiny_params, bits=4, group_size=32)
    B, S = 1, 8
    tokens = jnp.arange(S, dtype=jnp.int32)[None]
    cache = init_kv_cache(tiny_cfg, B, dtype=jnp.float32)
    jpre = jax.jit(llama_prefill, static_argnums=1)
    ref, _ = jpre(tiny_params, tiny_cfg, tokens, cache)
    got8, _ = jpre(qp8, tiny_cfg, tokens,
                            init_kv_cache(tiny_cfg, B, dtype=jnp.float32))
    got4, _ = jpre(qp4, tiny_cfg, tokens,
                            init_kv_cache(tiny_cfg, B, dtype=jnp.float32))
    p_ref = jax.nn.softmax(ref[:, -1]).ravel()
    p8 = jax.nn.softmax(got8[:, -1]).ravel()
    p4 = jax.nn.softmax(got4[:, -1]).ravel()
    # top-1 agreement + bounded probability drift
    assert int(jnp.argmax(p_ref)) == int(jnp.argmax(p8))
    assert float(jnp.abs(p8 - p_ref).max()) < 0.05
    assert float(jnp.abs(p4 - p_ref).max()) < 0.15


def test_int4_pack_roundtrip(rng):
    from infinitensor_tpu.quant.weight_only import (
        quantize_weight, dequantize_weight)
    w = rng.standard_normal((64, 32), dtype=np.float32)
    q8 = quantize_weight(w, bits=8, group_size=16)
    q4 = quantize_weight(w, bits=4, group_size=16)
    w8 = np.asarray(dequantize_weight(q8, jnp.float32))
    w4 = np.asarray(dequantize_weight(q4, jnp.float32))
    assert np.abs(w8 - w).max() < np.abs(w).max() / 64
    assert np.abs(w4 - w).max() < np.abs(w).max() / 4
    assert q4.qweight.shape == (32, 32)


def test_gqa_decode_attention(rng):
    from infinitensor_tpu.kernels.attention import (
        decode_attention_gqa, decode_attention_ref)
    B, Hkv, rep, S, D = 2, 2, 3, 16, 8
    H = Hkv * rep
    kc = jnp.asarray(rng.standard_normal((B, Hkv, S, D), dtype=np.float32))
    vc = jnp.asarray(rng.standard_normal((B, Hkv, S, D), dtype=np.float32))
    q = jnp.asarray(rng.standard_normal((B, H, 1, D), dtype=np.float32))
    k = jnp.asarray(rng.standard_normal((B, Hkv, 1, D), dtype=np.float32))
    v = jnp.asarray(rng.standard_normal((B, Hkv, 1, D), dtype=np.float32))
    pos = jnp.array([4, 9], jnp.int32)
    out, kc2, vc2 = decode_attention_gqa(kc, vc, q, k, v, pos)
    # oracle: repeat kv heads and use the plain ref kernel
    kcr = jnp.repeat(kc, rep, axis=1)
    vcr = jnp.repeat(vc, rep, axis=1)
    kr = jnp.repeat(k, rep, axis=1)
    vr = jnp.repeat(v, rep, axis=1)
    ref, _, _ = decode_attention_ref(kcr, vcr, q, kr, vr, pos)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5,
                               atol=1e-5)
    # caches updated at per-batch positions
    np.testing.assert_allclose(np.asarray(kc2[0, :, 4]),
                               np.asarray(k[0, :, 0]))
    np.testing.assert_allclose(np.asarray(vc2[1, :, 9]),
                               np.asarray(v[1, :, 0]))


def test_int8_kv_cache_decode(tiny_cfg, tiny_params):
    """INT8 KV cache stays close to the float-cache decode path
    (BASELINE: INT8 KV cache for serving)."""
    B, S = 1, 6
    rngl = np.random.default_rng(3)
    tokens = jnp.asarray(rngl.integers(0, 100, (B, S)), jnp.int32)
    cache_f = init_kv_cache(tiny_cfg, B, dtype=jnp.float32)
    logits_f, cache_f = llama_prefill(tiny_params, tiny_cfg, tokens, cache_f)
    cache_q = init_kv_cache(tiny_cfg, B, kv_quant=True)
    logits_q, cache_q = llama_prefill(tiny_params, tiny_cfg, tokens, cache_q)
    assert cache_q["k"][0].dtype == jnp.int8
    p_f = jax.nn.softmax(logits_f[:, -1])
    p_q = jax.nn.softmax(logits_q[:, -1])
    assert float(jnp.abs(p_f - p_q).max()) < 0.05
    # one decode step on the quantized cache
    pos = jnp.full((B,), S, jnp.int32)
    step_f, cache_f = llama_decode_step(tiny_params, tiny_cfg,
                                        tokens[:, 0], pos, cache_f)
    step_q, cache_q = llama_decode_step(tiny_params, tiny_cfg,
                                        tokens[:, 0], pos, cache_q)
    assert int(jnp.argmax(step_f)) == int(jnp.argmax(step_q))
    assert cache_q["k_scale"][0].shape == cache_q["k"][0].shape[:-1]


def test_decode_multi_matches_single_steps():
    """llama_decode_multi (lax.scan fused N-step greedy decode) produces
    exactly the tokens of N single decode steps."""
    import jax
    import jax.numpy as jnp
    from infinitensor_tpu.models.llama import (
        LlamaConfig, init_llama_params, init_kv_cache, llama_decode_step,
        llama_decode_multi)
    cfg = LlamaConfig(vocab_size=128, dim=64, n_layers=2, n_heads=4,
                      n_kv_heads=2, intermediate=128, max_seq=32)
    params = init_llama_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    cache = init_kv_cache(cfg, 2, dtype=jnp.float32)
    tok = jnp.array([3, 5], jnp.int32)
    pos = jnp.array([4, 4], jnp.int32)
    c, t, p, outs = cache, tok, pos, []
    for _ in range(5):
        lg, c = llama_decode_step(params, cfg, t, p, c)
        t = jnp.argmax(lg, -1).astype(jnp.int32)
        outs.append(t)
        p = p + 1
    ref = jnp.stack(outs, 1)
    got, t2, p2, _ = llama_decode_multi(params, cfg, tok, pos, cache, 5)
    assert (got == ref).all()
    assert (t2 == t).all() and (p2 == p).all()


def test_flash_decode_q8_kernel_parity():
    """Pallas INT8-KV flash-decode kernel (interpret mode) matches the jnp
    dequant-attention oracle — scales folded post-dot must equal explicit
    dequantization."""
    from infinitensor_tpu.kernels.attention import (
        flash_decode_q8, quantize_kv_row)
    rng = np.random.default_rng(7)
    B, H, Hkv, S, D = 2, 8, 4, 64, 32
    q = jnp.asarray(rng.standard_normal((B, H, 1, D)), jnp.float32)
    kq, ks = quantize_kv_row(
        jnp.asarray(rng.standard_normal((B, Hkv, S, D)), jnp.float32))
    vq, vs = quantize_kv_row(
        jnp.asarray(rng.standard_normal((B, Hkv, S, D)), jnp.float32))
    pos = jnp.asarray([13, 63], jnp.int32)
    out = flash_decode_q8(q, kq, vq, ks, vs, pos, seq_block=16,
                          interpret=True)

    kd = np.asarray(kq, np.float32) * np.asarray(ks)[..., None]
    vd = np.asarray(vq, np.float32) * np.asarray(vs)[..., None]
    rep = H // Hkv
    qf = np.asarray(q, np.float32).reshape(B, Hkv, rep, D)
    s = np.einsum("bgrd,bgsd->bgrs", qf, kd) / np.sqrt(D)
    mask = (np.arange(S)[None, None, None, :]
            <= np.asarray(pos)[:, None, None, None])
    s = np.where(mask, s, -np.inf)
    p = np.exp(s - s.max(-1, keepdims=True))
    p = p / p.sum(-1, keepdims=True)
    exp = np.einsum("bgrs,bgsd->bgrd", p, vd).reshape(B, H, 1, D)
    np.testing.assert_allclose(np.asarray(out), exp, rtol=1e-4, atol=1e-5)
