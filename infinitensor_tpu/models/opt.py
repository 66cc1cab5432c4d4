"""OPT family: functional JAX implementation with static KV cache.

The reference exercises OPT through its distributed launcher parity harness
(reference examples/distributed/cuda/cuda_launch.py — the GPT-2/BERT/OPT/
Llama TP model set). Same infra as gpt2.py/llama.py: params pytree, prefill
+ decode with the shared flash-decode kernel, optional weight-only INT8/INT4.

OPT specifics vs GPT-2 (HF modeling_opt.py semantics):
* learned positional embeddings with a +2 offset (table rows = max_seq + 2)
* ReLU FFN activation
* pre-layernorm (do_layer_norm_before=True, the standard configs)
* LM head tied to the token embedding
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Optional

import jax
import jax.numpy as jnp

from infinitensor_tpu.models.gpt2 import _linear, _ln
from infinitensor_tpu.quant.weight_only import quantize_weight

_POS_OFFSET = 2


@dataclasses.dataclass(frozen=True)
class OPTConfig:
    vocab_size: int = 50272
    dim: int = 768           # opt-125m geometry by default
    n_layers: int = 12
    n_heads: int = 12
    ffn_dim: int = 3072
    max_seq: int = 2048
    layer_norm_eps: float = 1e-5
    dtype: Any = jnp.bfloat16

    @property
    def head_dim(self) -> int:
        return self.dim // self.n_heads

    @staticmethod
    def opt_1b3(**kw):
        return OPTConfig(dim=2048, n_layers=24, n_heads=32, ffn_dim=8192,
                         **kw)

    @staticmethod
    def tiny(**kw):
        return OPTConfig(vocab_size=256, dim=64, n_layers=2, n_heads=4,
                         ffn_dim=128, max_seq=64, **kw)


def init_opt_params(cfg: OPTConfig, key, dtype=None) -> dict:
    dtype = dtype or cfg.dtype
    keys = iter(jax.random.split(key, cfg.n_layers * 4 + 2))

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
            "w_up": dense(next(keys), cfg.dim, cfg.ffn_dim),
            "b_up": jnp.zeros((cfg.ffn_dim,), dtype),
            "w_down": dense(next(keys), cfg.ffn_dim, cfg.dim),
            "b_down": jnp.zeros((cfg.dim,), dtype),
        })
    return {
        "wte": dense(next(keys), cfg.vocab_size, cfg.dim),
        "wpe": dense(next(keys), cfg.max_seq + _POS_OFFSET, cfg.dim,
                     std=0.01),
        "lnf_g": jnp.ones((cfg.dim,), dtype),
        "lnf_b": jnp.zeros((cfg.dim,), dtype),
        "layers": layers,
    }


_QKEYS = ("w_qkv", "w_o", "w_up", "w_down")


def quantize_opt_params(params, bits=8, group_size: Optional[int] = None):
    out = {k: v for k, v in params.items() if k != "layers"}
    out["layers"] = []
    for layer in params["layers"]:
        ql = dict(layer)
        for k in _QKEYS:
            ql[k] = quantize_weight(layer[k], bits, group_size)
        out["layers"].append(ql)
    return out


def init_opt_cache(cfg: OPTConfig, batch: int,
                   max_seq: Optional[int] = None, dtype=None) -> dict:
    S = max_seq or cfg.max_seq
    dtype = dtype or cfg.dtype
    shape = (batch, cfg.n_heads, S, cfg.head_dim)
    return {"k": [jnp.zeros(shape, dtype) for _ in range(cfg.n_layers)],
            "v": [jnp.zeros(shape, dtype) for _ in range(cfg.n_layers)]}


def opt_prefill(params, cfg: OPTConfig, tokens, cache):
    B, S = tokens.shape
    x = jnp.take(params["wte"], tokens, axis=0) + \
        params["wpe"][_POS_OFFSET:_POS_OFFSET + S][None]
    new_k, new_v = [], []
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
        u = jax.nn.relu(_linear(h2, layer["w_up"], layer["b_up"])
                        .astype(jnp.float32))
        x = x + _linear(u.astype(x.dtype), layer["w_down"], layer["b_down"])
        ck = jnp.zeros_like(cache["k"][0]).at[:, :, :S].set(
            jnp.swapaxes(k, 1, 2).astype(cache["k"][0].dtype))
        cv = jnp.zeros_like(cache["v"][0]).at[:, :, :S].set(
            jnp.swapaxes(v, 1, 2).astype(cache["v"][0].dtype))
        new_k.append(ck)
        new_v.append(cv)
    x = _ln(x, params["lnf_g"], params["lnf_b"], cfg.layer_norm_eps)
    logits = jnp.matmul(x, params["wte"].T,
                        preferred_element_type=jnp.float32)
    return logits.astype(jnp.float32), {"k": new_k, "v": new_v}


def opt_decode_step(params, cfg: OPTConfig, token, pos, cache):
    """token [B] int32, pos [B] int32 -> (logits [B, vocab], cache')."""
    from infinitensor_tpu.kernels.attention import decode_attention_gqa
    B = token.shape[0]
    x = jnp.take(params["wte"], token, axis=0)[:, None, :] + \
        jnp.take(params["wpe"], pos + _POS_OFFSET, axis=0)[:, None, :]
    new_k, new_v = [], []
    for i, layer in enumerate(params["layers"]):
        h = _ln(x, layer["ln1_g"], layer["ln1_b"], cfg.layer_norm_eps)
        qkv = _linear(h, layer["w_qkv"], layer["b_qkv"])
        q, k, v = jnp.split(qkv, 3, axis=-1)
        qh = jnp.swapaxes(q.reshape(B, 1, cfg.n_heads, cfg.head_dim), 1, 2)
        kh = jnp.swapaxes(k.reshape(B, 1, cfg.n_heads, cfg.head_dim), 1, 2)
        vh = jnp.swapaxes(v.reshape(B, 1, cfg.n_heads, cfg.head_dim), 1, 2)
        out, ck, cv = decode_attention_gqa(
            cache["k"][i], cache["v"][i], qh,
            kh.astype(cache["k"][i].dtype),
            vh.astype(cache["v"][i].dtype), pos)
        att = jnp.swapaxes(out, 1, 2).reshape(B, 1, cfg.dim)
        x = x + _linear(att, layer["w_o"], layer["b_o"])
        h2 = _ln(x, layer["ln2_g"], layer["ln2_b"], cfg.layer_norm_eps)
        u = jax.nn.relu(_linear(h2, layer["w_up"], layer["b_up"])
                        .astype(jnp.float32))
        x = x + _linear(u.astype(x.dtype), layer["w_down"], layer["b_down"])
        new_k.append(ck)
        new_v.append(cv)
    x = _ln(x, params["lnf_g"], params["lnf_b"], cfg.layer_norm_eps)
    logits = jnp.matmul(x[:, 0], params["wte"].T,
                        preferred_element_type=jnp.float32)
    return logits.astype(jnp.float32), {"k": new_k, "v": new_v}
