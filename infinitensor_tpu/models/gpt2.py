"""GPT-2 family: functional JAX implementation with static KV cache.

The reference exercises GPT-2 through its distributed launcher parity
harness (reference examples/distributed/cuda/cuda_launch.py with GPT-2 ONNX).
Here it is a native model (same infra as llama.py): params pytree, prefill +
decode with the shared flash-decode kernel, optional weight-only INT8/INT4
(BASELINE config: GPT-2 345M INT8 weight-only with KV cache).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Optional

import jax
import jax.numpy as jnp

from infinitensor_tpu.quant.weight_only import (
    QuantizedLinear, quantize_weight, wo_matmul,
)


@dataclasses.dataclass(frozen=True)
class GPT2Config:
    vocab_size: int = 50257
    dim: int = 1024          # 345M ("gpt2-medium") geometry by default
    n_layers: int = 24
    n_heads: int = 16
    max_seq: int = 1024
    layer_norm_eps: float = 1e-5
    dtype: Any = jnp.bfloat16

    @property
    def head_dim(self) -> int:
        return self.dim // self.n_heads

    @staticmethod
    def gpt2_small(**kw):
        return GPT2Config(dim=768, n_layers=12, n_heads=12, **kw)

    @staticmethod
    def tiny(**kw):
        return GPT2Config(vocab_size=256, dim=64, n_layers=2, n_heads=4,
                          max_seq=64, **kw)


def init_gpt2_params(cfg: GPT2Config, key, dtype=None) -> dict:
    dtype = dtype or cfg.dtype
    keys = iter(jax.random.split(key, cfg.n_layers * 4 + 3))

    def dense(k, din, dout, std=0.02):
        return (jax.random.normal(k, (din, dout), jnp.float32) * std
                ).astype(dtype)

    layers = []
    for _ in range(cfg.n_layers):
        layers.append({
            "ln1_g": jnp.ones((cfg.dim,), dtype),
            "ln1_b": jnp.zeros((cfg.dim,), dtype),
            "w_qkv": dense(next(keys), cfg.dim, 3 * cfg.dim),
            "b_qkv": jnp.zeros((3 * cfg.dim,), dtype),
            "w_o": dense(next(keys), cfg.dim, cfg.dim),
            "b_o": jnp.zeros((cfg.dim,), dtype),
            "ln2_g": jnp.ones((cfg.dim,), dtype),
            "ln2_b": jnp.zeros((cfg.dim,), dtype),
            "w_up": dense(next(keys), cfg.dim, 4 * cfg.dim),
            "b_up": jnp.zeros((4 * cfg.dim,), dtype),
            "w_down": dense(next(keys), 4 * cfg.dim, cfg.dim),
            "b_down": jnp.zeros((cfg.dim,), dtype),
        })
    return {
        "wte": dense(next(keys), cfg.vocab_size, cfg.dim),
        "wpe": dense(next(keys), cfg.max_seq, cfg.dim, std=0.01),
        "lnf_g": jnp.ones((cfg.dim,), dtype),
        "lnf_b": jnp.zeros((cfg.dim,), dtype),
        "layers": layers,
    }


_QKEYS = ("w_qkv", "w_o", "w_up", "w_down")


def quantize_gpt2_params(params, bits=8, group_size: Optional[int] = None,
                         quant_lm_head: bool = True):
    out = {k: v for k, v in params.items() if k != "layers"}
    out["layers"] = []
    for layer in params["layers"]:
        ql = dict(layer)
        for k in _QKEYS:
            ql[k] = quantize_weight(layer[k], bits, group_size)
        out["layers"].append(ql)
    if quant_lm_head:
        # GPT-2 ties lm_head to wte: the decode-step logits matmul
        # streams wte.T (vocab x dim, 25% of the per-step bytes at 345M)
        # in bf16 — store an int8 transposed copy for the matmul while
        # the gather keeps the float wte (token rows are pennies)
        # pad_out: 50257 has no 128-multiple divisor, which would push
        # the Pallas kernel to its fallback; 51200 = 50 x 1024 tiles
        out["lm_head_q"] = quantize_weight(
            jnp.asarray(params["wte"]).T.astype(jnp.float32), bits,
            group_size, pad_out=1024)
    return out


def _linear(x, w, b=None):
    if isinstance(w, QuantizedLinear):
        y = wo_matmul(x, w)
    else:
        y = jnp.matmul(x, w, preferred_element_type=jnp.float32).astype(x.dtype)
    if b is not None:
        y = y + b
    return y


def _ln(x, g, b, eps):
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mu), axis=-1, keepdims=True)
    out = (x32 - mu) * jax.lax.rsqrt(var + eps)
    return (out * g.astype(jnp.float32) + b.astype(jnp.float32)).astype(x.dtype)


def init_gpt2_cache(cfg: GPT2Config, batch: int,
                    max_seq: Optional[int] = None, dtype=None,
                    kv_quant: bool = False) -> dict:
    S = max_seq or cfg.max_seq
    dtype = dtype or cfg.dtype
    shape = (batch, cfg.n_heads, S, cfg.head_dim)
    if kv_quant:
        # INT8 rows + per-(b, h, s) f32 scales: half the decode-side KV
        # stream of bf16 (the serving budget showed GPT-2 decode is
        # KV-read-bound, docs/SERVING_BUDGET.json)
        return {"k": [jnp.zeros(shape, jnp.int8)
                      for _ in range(cfg.n_layers)],
                "v": [jnp.zeros(shape, jnp.int8)
                      for _ in range(cfg.n_layers)],
                "k_scale": [jnp.zeros(shape[:-1], jnp.float32)
                            for _ in range(cfg.n_layers)],
                "v_scale": [jnp.zeros(shape[:-1], jnp.float32)
                            for _ in range(cfg.n_layers)]}
    return {"k": [jnp.zeros(shape, dtype) for _ in range(cfg.n_layers)],
            "v": [jnp.zeros(shape, dtype) for _ in range(cfg.n_layers)]}


def gpt2_prefill(params, cfg: GPT2Config, tokens, cache):
    B, S = tokens.shape
    x = jnp.take(params["wte"], tokens, axis=0) + params["wpe"][:S][None]
    quant_cache = "k_scale" in cache
    new_k, new_v, new_ks, new_vs = [], [], [], []
    causal = jnp.tril(jnp.ones((S, S), bool))[None, None]
    for layer in params["layers"]:
        h = _ln(x, layer["ln1_g"], layer["ln1_b"], cfg.layer_norm_eps)
        qkv = _linear(h, layer["w_qkv"], layer["b_qkv"])
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(B, S, cfg.n_heads, cfg.head_dim)
        k = k.reshape(B, S, cfg.n_heads, cfg.head_dim)
        v = v.reshape(B, S, cfg.n_heads, cfg.head_dim)
        scores = jnp.einsum("bshd,bthd->bhst", q.astype(jnp.float32),
                            k.astype(jnp.float32)) / math.sqrt(cfg.head_dim)
        scores = jnp.where(causal, scores, -1e30)
        p = jax.nn.softmax(scores, axis=-1)
        att = jnp.einsum("bhst,bthd->bshd", p, v.astype(jnp.float32)
                         ).reshape(B, S, cfg.dim).astype(x.dtype)
        x = x + _linear(att, layer["w_o"], layer["b_o"])
        h2 = _ln(x, layer["ln2_g"], layer["ln2_b"], cfg.layer_norm_eps)
        u = jax.nn.gelu(_linear(h2, layer["w_up"], layer["b_up"])
                        .astype(jnp.float32), approximate=True)
        x = x + _linear(u.astype(x.dtype), layer["w_down"], layer["b_down"])
        kh = jnp.swapaxes(k, 1, 2)
        vh = jnp.swapaxes(v, 1, 2)
        if quant_cache:
            from infinitensor_tpu.kernels.attention import quantize_kv_row
            kq, ks = quantize_kv_row(kh)
            vq, vs = quantize_kv_row(vh)
            new_ks.append(jnp.zeros_like(cache["k_scale"][0])
                          .at[:, :, :S].set(ks))
            new_vs.append(jnp.zeros_like(cache["v_scale"][0])
                          .at[:, :, :S].set(vs))
            kh, vh = kq, vq
        ck = jnp.zeros_like(cache["k"][0]).at[:, :, :S].set(
            kh.astype(cache["k"][0].dtype))
        cv = jnp.zeros_like(cache["v"][0]).at[:, :, :S].set(
            vh.astype(cache["v"][0].dtype))
        new_k.append(ck)
        new_v.append(cv)
    x = _ln(x, params["lnf_g"], params["lnf_b"], cfg.layer_norm_eps)
    if "lm_head_q" in params:
        logits = wo_matmul(x, params["lm_head_q"]).astype(jnp.float32)
    else:
        logits = jnp.matmul(x, params["wte"].T,
                            preferred_element_type=jnp.float32)
    out_cache = {"k": new_k, "v": new_v}
    if quant_cache:
        out_cache["k_scale"] = new_ks
        out_cache["v_scale"] = new_vs
    return logits.astype(jnp.float32), out_cache


def gpt2_decode_step(params, cfg: GPT2Config, token, pos, cache):
    """token [B] int32, pos [B] int32 -> (logits [B, vocab], cache').
    An INT8 cache ('k_scale' present) dispatches to the q8 fused decode
    attention, halving the KV stream (serving's dominant HBM cost)."""
    from infinitensor_tpu.kernels.attention import (
        decode_attention_gqa, decode_attention_gqa_q8)
    B = token.shape[0]
    quant_cache = "k_scale" in cache
    x = jnp.take(params["wte"], token, axis=0)[:, None, :] + \
        jnp.take(params["wpe"], pos, axis=0)[:, None, :]
    new = {key: [] for key in cache}
    import os
    from infinitensor_tpu.kernels.quant_matmul import quant_matmul_ln
    fuse_ln = os.environ.get("INFINITPU_GPT2_FUSED_LN", "1") == "1"
    for i, layer in enumerate(params["layers"]):
        if fuse_ln and isinstance(layer["w_qkv"], QuantizedLinear):
            # fused LN+matmul+bias: the decode step at B<=32 is
            # per-op-latency-bound (SERVING_BUDGET v2), each standalone
            # LN/bias op costs like a kernel launch
            qkv = quant_matmul_ln(x, layer["ln1_g"], layer["ln1_b"],
                                  layer["w_qkv"], bias=layer["b_qkv"],
                                  eps=cfg.layer_norm_eps)
        else:
            h = _ln(x, layer["ln1_g"], layer["ln1_b"],
                    cfg.layer_norm_eps)
            qkv = _linear(h, layer["w_qkv"], layer["b_qkv"])
        q, k, v = jnp.split(qkv, 3, axis=-1)
        qh = jnp.swapaxes(q.reshape(B, 1, cfg.n_heads, cfg.head_dim), 1, 2)
        kh = jnp.swapaxes(k.reshape(B, 1, cfg.n_heads, cfg.head_dim), 1, 2)
        vh = jnp.swapaxes(v.reshape(B, 1, cfg.n_heads, cfg.head_dim), 1, 2)
        if quant_cache:
            out, ck, cv, ks, vs = decode_attention_gqa_q8(
                cache["k"][i], cache["v"][i], cache["k_scale"][i],
                cache["v_scale"][i], qh, kh, vh, pos)
            new["k_scale"].append(ks)
            new["v_scale"].append(vs)
        else:
            out, ck, cv = decode_attention_gqa(
                cache["k"][i], cache["v"][i], qh,
                kh.astype(cache["k"][i].dtype),
                vh.astype(cache["v"][i].dtype), pos)
        att = jnp.swapaxes(out, 1, 2).reshape(B, 1, cfg.dim)
        x = x + _linear(att, layer["w_o"], layer["b_o"])
        if fuse_ln and isinstance(layer["w_up"], QuantizedLinear):
            up = quant_matmul_ln(x, layer["ln2_g"], layer["ln2_b"],
                                 layer["w_up"], bias=layer["b_up"],
                                 eps=cfg.layer_norm_eps)
        else:
            h2 = _ln(x, layer["ln2_g"], layer["ln2_b"],
                     cfg.layer_norm_eps)
            up = _linear(h2, layer["w_up"], layer["b_up"])
        u = jax.nn.gelu(up.astype(jnp.float32), approximate=True)
        x = x + _linear(u.astype(x.dtype), layer["w_down"], layer["b_down"])
        new["k"].append(ck)
        new["v"].append(cv)
    x = _ln(x, params["lnf_g"], params["lnf_b"], cfg.layer_norm_eps)
    if "lm_head_q" in params:
        logits = wo_matmul(x[:, 0], params["lm_head_q"])
    else:
        logits = jnp.matmul(x[:, 0], params["wte"].T,
                            preferred_element_type=jnp.float32)
    return logits.astype(jnp.float32), new
