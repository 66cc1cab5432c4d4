"""The framework's own LLM loop: Llama decode through GraphHandler ->
Graph IR -> (ONNX round-trip) -> GraphExecutor with donated KV state,
token-for-token against the hand-written JAX model.

Reference anchor: examples/python/llama_kvcache_inference.py:102-144 — the
reference proves its engine by decoding Llama through the graph with the
fused AttentionKVCache op; this is the TPU-native equivalent.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from infinitensor_tpu.models.llama import (
    LlamaConfig, init_kv_cache, init_llama_params, llama_decode_step)
from infinitensor_tpu.models.graph_llama import (
    GraphLlamaServingAdapter, build_llama_decoder, graph_greedy_decode)
from infinitensor_tpu.runtime.executor import GraphExecutor

CFG = LlamaConfig(vocab_size=128, dim=64, n_layers=2, n_heads=4,
                  n_kv_heads=4, intermediate=96, max_seq=32,
                  dtype=jnp.float32)


@pytest.fixture(scope="module")
def params():
    return init_llama_params(CFG, jax.random.PRNGKey(7), dtype=jnp.float32)


def _reference_tokens(params, first_token, n_steps, start_pos=0):
    cache = init_kv_cache(CFG, 1, dtype=jnp.float32)
    tok = jnp.full((1,), first_token, jnp.int32)
    step = jax.jit(llama_decode_step, static_argnums=1, donate_argnums=4)
    toks = []
    for j in range(n_steps):
        pos = jnp.full((1,), start_pos + j, jnp.int32)
        logits, cache = step(params, CFG, tok, pos, cache)
        tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        toks.append(int(tok[0]))
    return toks


def test_graph_decode_matches_native(params):
    """Autoregressive decode via GraphExecutor.stepper (donated caches)
    produces the exact token sequence of models/llama.py."""
    want = _reference_tokens(params, first_token=5, n_steps=8)
    dec = build_llama_decoder(params, CFG, batch=1)
    got = graph_greedy_decode(dec, first_token=5, n_steps=8, start_pos=0)
    assert got.shape == (1, 8)
    assert list(got[0]) == want


def test_graph_decode_onnx_roundtrip(params):
    """Export the decode graph to ONNX, import it back, decode through the
    imported graph — same tokens (the full ONNX->IR->execute loop on an
    autoregressive LLM)."""
    from infinitensor_tpu.onnx.exporter import export_onnx
    from infinitensor_tpu.onnx.importer import OnnxStub

    want = _reference_tokens(params, first_token=9, n_steps=6)
    dec = build_llama_decoder(params, CFG, batch=1)
    stub = OnnxStub(export_onnx(dec.graph, "llama_decoder").serialize())
    names = {t.name for t in stub.handler.graph.tensors}
    for n in ([dec.token_name, dec.pos_name, dec.logits_name]
              + dec.k_in + dec.v_in + dec.k_out + dec.v_out):
        assert n in names, f"tensor name {n} lost in ONNX round-trip"
    dec2 = type(dec)(handler=None, cfg=CFG, batch=1, max_seq=CFG.max_seq,
                     token_name=dec.token_name, pos_name=dec.pos_name,
                     logits_name=dec.logits_name, k_in=dec.k_in,
                     v_in=dec.v_in, k_out=dec.k_out, v_out=dec.v_out)
    ex = GraphExecutor(stub.handler.graph)
    got = graph_greedy_decode(dec2, first_token=9, n_steps=6, start_pos=0,
                              executor=ex)
    assert list(got[0]) == want


def test_stepper_state_is_device_side(params):
    dec = build_llama_decoder(params, CFG, batch=1)
    ex = GraphExecutor(dec.graph)
    step = ex.stepper(dec.state_map())
    step({dec.token_name: np.array([3], np.int32),
          dec.pos_name: np.array([0], np.int32)})
    snap = step.fetch_state()
    k0 = snap[dec.k_in[0]]
    assert k0.shape == (1, CFG.n_heads, CFG.max_seq, CFG.head_dim)
    assert np.abs(k0[:, :, 0]).max() > 0        # row 0 was written
    assert np.abs(k0[:, :, 1:]).max() == 0      # nothing else touched


def test_stepper_rejects_bad_state_map(params):
    dec = build_llama_decoder(params, CFG, batch=1)
    ex = GraphExecutor(dec.graph)
    with pytest.raises(ValueError, match="state_map"):
        ex.stepper({"nonexistent": dec.k_out[0]})


def test_serving_engine_runs_graph_ir_model(params):
    """ServingEngine with the graph-IR adapter generates the same tokens
    as the engine running the native llama fns — continuous batching on
    top of the framework's own graph loop."""
    from infinitensor_tpu.serving.engine import ServingEngine

    prompts = [[3, 5, 7], [11, 13]]
    native = ServingEngine(params, CFG, max_slots=2,
                           prefill_buckets=(8,))
    want = []
    for i, p in enumerate(prompts):
        want.append(native.submit(p, max_new_tokens=5, uid=10 + i))
    native.run_to_completion()
    want = [list(r.generated) for r in want]

    ad = GraphLlamaServingAdapter(params, CFG)
    eng = ServingEngine(params, CFG, max_slots=2, prefill_buckets=(8,),
                        prefill_fn=ad.prefill_fn, decode_fn=ad.decode_fn,
                        init_cache_fn=ad.init_cache_fn)
    got = []
    for i, p in enumerate(prompts):
        got.append(eng.submit(p, max_new_tokens=5, uid=10 + i))
    eng.run_to_completion()
    got = [list(r.generated) for r in got]
    assert got == want


def test_graph_decode_respects_rope_theta():
    """A non-default rope_theta must flow through the graph RoPE op
    (review finding: the lowering used to hardcode 10000)."""
    cfg = LlamaConfig(vocab_size=128, dim=64, n_layers=2, n_heads=4,
                      n_kv_heads=4, intermediate=96, max_seq=32,
                      rope_theta=500000.0, dtype=jnp.float32)
    params = init_llama_params(cfg, jax.random.PRNGKey(3),
                               dtype=jnp.float32)
    cache = init_kv_cache(cfg, 1, dtype=jnp.float32)
    tok = jnp.full((1,), 5, jnp.int32)
    want = []
    for j in range(6):
        lg, cache = llama_decode_step(params, cfg, tok,
                                      jnp.full((1,), j, jnp.int32), cache)
        tok = jnp.argmax(lg, axis=-1).astype(jnp.int32)
        want.append(int(tok[0]))
    dec = build_llama_decoder(params, cfg, batch=1)
    got = graph_greedy_decode(dec, first_token=5, n_steps=6, start_pos=0)
    assert list(got[0]) == want


# ---------------------------------------------------------------------------
# Quantized + GQA + INT8-KV graph path (BASELINE config-4 layout through
# the graph IR; reference decodes its flagship through the engine the same
# way, llama_kvcache_inference.py:102-144)
# ---------------------------------------------------------------------------

GQA_CFG = LlamaConfig(vocab_size=128, dim=128, n_layers=2, n_heads=4,
                      n_kv_heads=2, intermediate=192, max_seq=32,
                      dtype=jnp.float32)


def _reference_tokens_cfg(params, cfg, first_token, n_steps,
                          kv_quant=False):
    cache = init_kv_cache(cfg, 1, dtype=jnp.float32, kv_quant=kv_quant)
    tok = jnp.full((1,), first_token, jnp.int32)
    step = jax.jit(llama_decode_step, static_argnums=1, donate_argnums=4)
    toks = []
    for j in range(n_steps):
        pos = jnp.full((1,), j, jnp.int32)
        logits, cache = step(params, cfg, tok, pos, cache)
        tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        toks.append(int(tok[0]))
    return toks


def test_graph_decode_gqa_matches_native():
    """GQA (n_kv_heads < n_heads) float decode through the graph IR —
    the MHA-only restriction is gone."""
    params = init_llama_params(GQA_CFG, jax.random.PRNGKey(3),
                               dtype=jnp.float32)
    want = _reference_tokens_cfg(params, GQA_CFG, 5, 8)
    dec = build_llama_decoder(params, GQA_CFG, batch=1)
    got = graph_greedy_decode(dec, first_token=5, n_steps=8, start_pos=0)
    assert list(got[0]) == want


@pytest.mark.parametrize("bits", [8, 4])
def test_graph_decode_quantized_gqa_kv8(bits):
    """Weight-only-quantized (fused wqkv/w_gateup MatMulWOQ ops with
    fused RMSNorm) + GQA + INT8 KV cache (AttentionKVCacheQ8), token-
    identical to the hand-written quantized fast path."""
    from infinitensor_tpu.models.llama import quantize_llama_params

    params = init_llama_params(GQA_CFG, jax.random.PRNGKey(11),
                               dtype=jnp.float32)
    qparams = quantize_llama_params(params, bits=bits, group_size=128)
    want = _reference_tokens_cfg(qparams, GQA_CFG, 7, 8, kv_quant=True)
    dec = build_llama_decoder(qparams, GQA_CFG, batch=1, kv_quant=True)
    ops = {op.op_type for op in dec.graph.operators}
    assert "MatMulWOQ" in ops and "AttentionKVCacheQ8" in ops
    assert "MatMul" not in ops          # every projection is quantized
    got = graph_greedy_decode(dec, first_token=7, n_steps=8, start_pos=0)
    assert list(got[0]) == want


def test_graph_decode_quantized_onnx_roundtrip():
    """The quantized GQA decode graph survives ONNX export -> import
    (MatMulWOQ / AttentionKVCacheQ8 under the custom domain, int8
    initializers) and decodes identically."""
    from infinitensor_tpu.models.llama import quantize_llama_params
    from infinitensor_tpu.onnx.exporter import export_onnx
    from infinitensor_tpu.onnx.importer import OnnxStub

    params = init_llama_params(GQA_CFG, jax.random.PRNGKey(13),
                               dtype=jnp.float32)
    qparams = quantize_llama_params(params, bits=4, group_size=128)
    dec = build_llama_decoder(qparams, GQA_CFG, batch=1, kv_quant=True)
    want = graph_greedy_decode(dec, first_token=9, n_steps=6, start_pos=0)

    stub = OnnxStub(export_onnx(dec.graph, "llama_woq").serialize())
    names = {t.name for t in stub.handler.graph.tensors}
    for n in ([dec.token_name, dec.pos_name, dec.logits_name]
              + dec.k_in + dec.v_in + dec.ks_in + dec.vs_in
              + dec.k_out + dec.v_out + dec.ks_out + dec.vs_out):
        assert n in names, f"tensor name {n} lost in ONNX round-trip"
    dec2 = type(dec)(handler=None, cfg=GQA_CFG, batch=1,
                     max_seq=GQA_CFG.max_seq, token_name=dec.token_name,
                     pos_name=dec.pos_name, logits_name=dec.logits_name,
                     k_in=dec.k_in, v_in=dec.v_in, k_out=dec.k_out,
                     v_out=dec.v_out, ks_in=dec.ks_in, vs_in=dec.vs_in,
                     ks_out=dec.ks_out, vs_out=dec.vs_out)
    ex = GraphExecutor(stub.handler.graph)
    got = graph_greedy_decode(dec2, first_token=9, n_steps=6, start_pos=0,
                              executor=ex)
    assert list(got[0]) == list(want[0])


def test_fused_greedy_decode_matches_stepper():
    """The single-executable multi-step scan (make_fused_greedy_decode)
    produces the stepper's exact token stream across chained calls."""
    from infinitensor_tpu.models.graph_llama import make_fused_greedy_decode
    from infinitensor_tpu.models.llama import quantize_llama_params

    params = init_llama_params(GQA_CFG, jax.random.PRNGKey(21),
                               dtype=jnp.float32)
    qparams = quantize_llama_params(params, bits=8, group_size=128)
    dec = build_llama_decoder(qparams, GQA_CFG, batch=1, kv_quant=True)
    want = graph_greedy_decode(dec, first_token=4, n_steps=8, start_pos=0)

    fn, weights, state = make_fused_greedy_decode(dec, multi=4)
    t1, state = fn(weights, jnp.array([4], jnp.int32),
                   jnp.array([0], jnp.int32), state)
    t2, state = fn(weights, t1[:, -1], jnp.array([4], jnp.int32), state)
    got = np.concatenate([np.asarray(t1), np.asarray(t2)], axis=1)
    assert list(got[0]) == list(want[0])


def test_external_weights_device_binding():
    """external_weights=True builds the graph from shapes only; values
    bound via bind_llama_weights (device arrays, no host copy) decode
    identically to the data-carrying graph."""
    from infinitensor_tpu.models.graph_llama import bind_llama_weights
    from infinitensor_tpu.models.llama import quantize_llama_params

    params = init_llama_params(GQA_CFG, jax.random.PRNGKey(31),
                               dtype=jnp.float32)
    qparams = quantize_llama_params(params, bits=8, group_size=128)
    dec = build_llama_decoder(qparams, GQA_CFG, batch=1, kv_quant=True)
    want = graph_greedy_decode(dec, first_token=6, n_steps=6, start_pos=0)

    dec2 = build_llama_decoder(qparams, GQA_CFG, batch=1, kv_quant=True,
                               external_weights=True)
    ex = GraphExecutor(dec2.graph)
    with pytest.raises(ValueError, match="placeholder"):
        graph_greedy_decode(dec2, first_token=6, n_steps=1, start_pos=0,
                            executor=ex)
    bind_llama_weights(dec2, ex, qparams)
    got = graph_greedy_decode(dec2, first_token=6, n_steps=6, start_pos=0,
                              executor=ex)
    assert list(got[0]) == list(want[0])


def test_serving_engine_quantized_graph_ir_kv8():
    """ServingEngine running the QUANTIZED graph-IR model family (MatMulWOQ
    + AttentionKVCacheQ8 through the adapter) emits the native quantized
    engine's exact token stream — serving through the framework's own
    graph engine at the flagship config family."""
    from infinitensor_tpu.models.llama import quantize_llama_params
    from infinitensor_tpu.serving.engine import ServingEngine
    import functools
    from infinitensor_tpu.models.llama import init_kv_cache

    params = init_llama_params(GQA_CFG, jax.random.PRNGKey(41),
                               dtype=jnp.float32)
    qparams = quantize_llama_params(params, bits=4, group_size=128)
    prompts = [[3, 5, 7], [11, 13]]

    native = ServingEngine(qparams, GQA_CFG, max_slots=2,
                           prefill_buckets=(8,), kv_quant=True)
    want = [native.submit(p, max_new_tokens=5, uid=90 + i)
            for i, p in enumerate(prompts)]
    native.run_to_completion()
    want = [list(r.generated) for r in want]

    ad = GraphLlamaServingAdapter(qparams, GQA_CFG, kv_quant=True)
    eng = ServingEngine(qparams, GQA_CFG, max_slots=2,
                        prefill_buckets=(8,), prefill_fn=ad.prefill_fn,
                        decode_fn=ad.decode_fn,
                        init_cache_fn=ad.init_cache_fn)
    got = [eng.submit(p, max_new_tokens=5, uid=90 + i)
           for i, p in enumerate(prompts)]
    eng.run_to_completion()
    got = [list(r.generated) for r in got]
    assert got == want
