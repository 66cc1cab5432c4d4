"""BERT tests: HF parity + INT8 dynamic quantization accuracy
(BASELINE config: BERT-base INT8 dynamic-quantized parity within
quantization tolerance)."""

import math

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from infinitensor_tpu.models.bert import (
    BertConfig, init_bert_params, bert_encode, build_bert_layer_graph,
)


def test_hf_parity():
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    hf_cfg = transformers.BertConfig(
        vocab_size=128, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=128,
        max_position_embeddings=64, type_vocab_size=2,
        hidden_act="gelu", attn_implementation="eager")
    torch.manual_seed(0)
    hf = transformers.BertModel(hf_cfg).eval()

    cfg = BertConfig(vocab_size=128, dim=64, n_layers=2, n_heads=4,
                     intermediate=128, max_seq=64)

    def t2j(t):
        return jnp.asarray(t.detach().numpy())

    sd = hf.state_dict()
    layers = []
    for i in range(cfg.n_layers):
        p = f"encoder.layer.{i}."
        layers.append({
            "wq": t2j(sd[p + "attention.self.query.weight"]).T,
            "bq": t2j(sd[p + "attention.self.query.bias"]),
            "wk": t2j(sd[p + "attention.self.key.weight"]).T,
            "bk": t2j(sd[p + "attention.self.key.bias"]),
            "wv": t2j(sd[p + "attention.self.value.weight"]).T,
            "bv": t2j(sd[p + "attention.self.value.bias"]),
            "wo": t2j(sd[p + "attention.output.dense.weight"]).T,
            "bo": t2j(sd[p + "attention.output.dense.bias"]),
            "ln1_g": t2j(sd[p + "attention.output.LayerNorm.weight"]),
            "ln1_b": t2j(sd[p + "attention.output.LayerNorm.bias"]),
            "w_up": t2j(sd[p + "intermediate.dense.weight"]).T,
            "b_up": t2j(sd[p + "intermediate.dense.bias"]),
            "w_down": t2j(sd[p + "output.dense.weight"]).T,
            "b_down": t2j(sd[p + "output.dense.bias"]),
            "ln2_g": t2j(sd[p + "output.LayerNorm.weight"]),
            "ln2_b": t2j(sd[p + "output.LayerNorm.bias"]),
        })
    params = {
        "tok": t2j(sd["embeddings.word_embeddings.weight"]),
        "pos": t2j(sd["embeddings.position_embeddings.weight"]),
        "type": t2j(sd["embeddings.token_type_embeddings.weight"]),
        "emb_ln_g": t2j(sd["embeddings.LayerNorm.weight"]),
        "emb_ln_b": t2j(sd["embeddings.LayerNorm.bias"]),
        "layers": layers,
    }
    rng = np.random.default_rng(0)
    tokens = rng.integers(0, 128, (2, 12))
    with torch.no_grad():
        ref = hf(torch.from_numpy(tokens)).last_hidden_state.numpy()
    got = bert_encode(params, cfg, jnp.asarray(tokens, jnp.int32))
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-3, atol=2e-3)


def test_bert_layer_graph_matches_native(rng):
    cfg = BertConfig.tiny()
    params = init_bert_params(cfg, jax.random.PRNGKey(0))
    lp = params["layers"][0]
    B, S = 2, 8
    h = build_bert_layer_graph(cfg, lp, B, S, dynamic_quant=False)
    x = rng.standard_normal((B, S, cfg.dim), dtype=np.float32) * 0.5
    got = list(h.run({"x": x}, return_numpy=True).values())[0]

    # native oracle: single-layer encode without embeddings
    import jax.numpy as jnp2
    one_layer = {**params, "layers": [lp]}

    def oracle(xa):
        from infinitensor_tpu.models.bert import _ln
        xj = jnp2.asarray(xa)
        layer = lp
        hd = cfg.dim // cfg.n_heads
        q = (xj @ layer["wq"] + layer["bq"]).reshape(B, S, cfg.n_heads, hd)
        k = (xj @ layer["wk"] + layer["bk"]).reshape(B, S, cfg.n_heads, hd)
        v = (xj @ layer["wv"] + layer["bv"]).reshape(B, S, cfg.n_heads, hd)
        sc = jnp2.einsum("bshd,bthd->bhst", q, k) / math.sqrt(hd)
        p = jax.nn.softmax(sc, -1)
        att = jnp2.einsum("bhst,bthd->bshd", p, v).reshape(B, S, cfg.dim)
        x1 = _ln(xj + (att @ layer["wo"] + layer["bo"]), layer["ln1_g"],
                 layer["ln1_b"], cfg.eps)
        u = jax.nn.gelu(x1 @ layer["w_up"] + layer["b_up"],
                        approximate=False)
        return _ln(x1 + (u @ layer["w_down"] + layer["b_down"]),
                   layer["ln2_g"], layer["ln2_b"], cfg.eps)

    ref = np.asarray(oracle(x))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_bert_layer_dynamic_int8_close(rng):
    """Dynamic-INT8 graph output must stay within quantization tolerance of
    the float graph (the reference's parity-within-tolerance gate)."""
    cfg = BertConfig.tiny()
    params = init_bert_params(cfg, jax.random.PRNGKey(0))
    lp = params["layers"][0]
    B, S = 1, 8
    x = rng.standard_normal((B, S, cfg.dim), dtype=np.float32) * 0.5
    h_f = build_bert_layer_graph(cfg, lp, B, S, dynamic_quant=False)
    h_q = build_bert_layer_graph(cfg, lp, B, S, dynamic_quant=True)
    ops_q = {op.op_type for op in h_q.handler_ops()} if hasattr(h_q, 'handler_ops') else {op.op_type for op in h_q.graph.operators}
    assert "DynamicQuantizeLinear" in ops_q
    assert "MatMulInteger" in ops_q
    ref = list(h_f.run({"x": x}, return_numpy=True).values())[0]
    got = list(h_q.run({"x": x}, return_numpy=True).values())[0]
    # layer output is layernormed (unit scale): abs tolerance meaningful
    assert np.abs(got - ref).max() < 0.15
    assert np.abs(got - ref).mean() < 0.02
