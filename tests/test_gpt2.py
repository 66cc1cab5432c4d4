"""GPT-2 tests: HF parity + decode/prefill consistency (the reference's
distributed-launcher parity pattern, single device)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from infinitensor_tpu.models.gpt2 import (
    GPT2Config, init_gpt2_params, quantize_gpt2_params, gpt2_prefill,
    gpt2_decode_step, init_gpt2_cache,
)


@pytest.fixture(scope="module")
def cfg():
    return GPT2Config.tiny(dtype=jnp.float32)


@pytest.fixture(scope="module")
def params(cfg):
    return init_gpt2_params(cfg, jax.random.PRNGKey(2), dtype=jnp.float32)


def test_decode_matches_prefill(cfg, params):
    B, S = 1, 6
    rng = np.random.default_rng(1)
    tokens = jnp.asarray(rng.integers(0, 200, (B, S)), jnp.int32)
    cache = init_gpt2_cache(cfg, B, dtype=jnp.float32)
    full, _ = gpt2_prefill(params, cfg, tokens, cache)
    cache = init_gpt2_cache(cfg, B, dtype=jnp.float32)
    l3, cache = gpt2_prefill(params, cfg, tokens[:, :3], cache)
    np.testing.assert_allclose(np.asarray(l3), np.asarray(full[:, :3]),
                               rtol=2e-4, atol=2e-4)
    for t in range(3, S):
        pos = jnp.full((B,), t, jnp.int32)
        lg, cache = gpt2_decode_step(params, cfg, tokens[:, t], pos, cache)
        np.testing.assert_allclose(np.asarray(lg), np.asarray(full[:, t]),
                                   rtol=2e-4, atol=2e-4)


def test_hf_parity():
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    hf_cfg = transformers.GPT2Config(
        vocab_size=128, n_positions=64, n_embd=64, n_layer=2, n_head=4,
        attn_implementation="eager")
    torch.manual_seed(0)
    hf = transformers.GPT2LMHeadModel(hf_cfg).eval()

    cfg = GPT2Config(vocab_size=128, dim=64, n_layers=2, n_heads=4,
                     max_seq=64, dtype=jnp.float32)

    def t2j(t):
        return jnp.asarray(t.detach().numpy())

    sd = hf.state_dict()
    layers = []
    for i in range(cfg.n_layers):
        p = f"transformer.h.{i}."
        layers.append({
            "ln1_g": t2j(sd[p + "ln_1.weight"]),
            "ln1_b": t2j(sd[p + "ln_1.bias"]),
            "w_qkv": t2j(sd[p + "attn.c_attn.weight"]),   # [dim, 3dim] conv1d
            "b_qkv": t2j(sd[p + "attn.c_attn.bias"]),
            "w_o": t2j(sd[p + "attn.c_proj.weight"]),
            "b_o": t2j(sd[p + "attn.c_proj.bias"]),
            "ln2_g": t2j(sd[p + "ln_2.weight"]),
            "ln2_b": t2j(sd[p + "ln_2.bias"]),
            "w_up": t2j(sd[p + "mlp.c_fc.weight"]),
            "b_up": t2j(sd[p + "mlp.c_fc.bias"]),
            "w_down": t2j(sd[p + "mlp.c_proj.weight"]),
            "b_down": t2j(sd[p + "mlp.c_proj.bias"]),
        })
    params = {
        "wte": t2j(sd["transformer.wte.weight"]),
        "wpe": t2j(sd["transformer.wpe.weight"]),
        "lnf_g": t2j(sd["transformer.ln_f.weight"]),
        "lnf_b": t2j(sd["transformer.ln_f.bias"]),
        "layers": layers,
    }
    rng = np.random.default_rng(0)
    tokens = rng.integers(0, 128, (2, 10))
    with torch.no_grad():
        ref = hf(torch.from_numpy(tokens)).logits.numpy()
    cache = init_gpt2_cache(cfg, 2, dtype=jnp.float32)
    got, _ = gpt2_prefill(params, cfg, jnp.asarray(tokens, jnp.int32), cache)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-3, atol=1e-3)


def test_quantized_gpt2(cfg, params):
    qp = quantize_gpt2_params(params, bits=8, group_size=32)
    tokens = jnp.arange(8, dtype=jnp.int32)[None]
    cache = init_gpt2_cache(cfg, 1, dtype=jnp.float32)
    ref, _ = gpt2_prefill(params, cfg, tokens, cache)
    got, _ = gpt2_prefill(qp, cfg, tokens,
                          init_gpt2_cache(cfg, 1, dtype=jnp.float32))
    p_ref = jax.nn.softmax(ref[:, -1]).ravel()
    p_q = jax.nn.softmax(got[:, -1]).ravel()
    assert int(jnp.argmax(p_ref)) == int(jnp.argmax(p_q))


def test_gpt2_int8_kv_decode_parity(rng):
    """INT8-KV GPT-2 ('k_scale' cache): prefill + decode tokens match the
    bf16-cache path (quantization tolerance at tiny geometry)."""
    import functools
    import jax
    import jax.numpy as jnp
    import numpy as np
    from infinitensor_tpu.models.gpt2 import (
        GPT2Config, gpt2_decode_step, gpt2_prefill, init_gpt2_cache,
        init_gpt2_params)

    cfg = GPT2Config(vocab_size=128, dim=64, n_layers=2, n_heads=4,
                     max_seq=32, dtype=jnp.float32)
    params = init_gpt2_params(cfg, jax.random.PRNGKey(0),
                              dtype=jnp.float32)
    toks = jnp.asarray(rng.integers(1, 128, (1, 5)), jnp.int32)

    def run(kv_quant):
        cache = init_gpt2_cache(cfg, 1, dtype=jnp.float32,
                                kv_quant=kv_quant)
        logits, cache = gpt2_prefill(params, cfg, toks, cache)
        tok = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
        out = [int(tok[0])]
        for j in range(5, 11):
            lg, cache = gpt2_decode_step(params, cfg, tok,
                                         jnp.array([j], jnp.int32), cache)
            tok = jnp.argmax(lg, axis=-1).astype(jnp.int32)
            out.append(int(tok[0]))
        return out, cache

    want, _ = run(False)
    got, qc = run(True)
    assert "k_scale" in qc and qc["k"][0].dtype == jnp.int8
    assert got == want


def test_gpt2_serving_int8_kv(rng):
    """ServingEngine on the INT8-KV GPT-2 family produces the bf16-cache
    engine's token stream."""
    import functools
    import jax
    import jax.numpy as jnp
    from infinitensor_tpu.models.gpt2 import (
        GPT2Config, gpt2_decode_step, gpt2_prefill, init_gpt2_cache,
        init_gpt2_params)
    from infinitensor_tpu.serving.engine import ServingEngine

    cfg = GPT2Config(vocab_size=128, dim=64, n_layers=2, n_heads=4,
                     max_seq=32, dtype=jnp.float32)
    params = init_gpt2_params(cfg, jax.random.PRNGKey(0),
                              dtype=jnp.float32)
    prompts = [[3, 5, 7], [11, 13]]

    def run(init_cache):
        eng = ServingEngine(params, cfg, max_slots=2, prefill_buckets=(8,),
                            prefill_fn=gpt2_prefill,
                            decode_fn=gpt2_decode_step,
                            init_cache_fn=init_cache, decode_chunk=2)
        reqs = [eng.submit(list(p), max_new_tokens=5, uid=i)
                for i, p in enumerate(prompts)]
        eng.run_to_completion()
        return [list(r.generated) for r in reqs]

    want = run(init_gpt2_cache)
    got = run(functools.partial(init_gpt2_cache, kv_quant=True))
    assert got == want
