"""Llama-family model: TPU-native functional implementation.

Replaces the reference's ONNX-driven Llama path
(examples/python/llama_kvcache_inference.py + the AttentionKVCache/RoPE/
RMSNorm custom ops): here the model is a first-class functional JAX program —
params are a pytree, the KV cache is a static-shape pytree carried through
``lax.scan``-able step functions, and every hot op routes to the Pallas
kernels (decode attention, RMSNorm, fused dequant matmul).

Design points (TPU):
* static cache [L, B, n_kv, S_max, head_dim] + position scalar: no dynamic
  shapes, decode step compiles once;
* GQA: kv heads repeated at attention time (no materialized repeat in HBM);
* weight-only INT8/INT4 via quant.QuantizedLinear, activations bf16;
* TP shardings for all params/cache in parallel/llama_sharding.py.
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from infinitensor_tpu.quant.weight_only import (
    QuantizedLinear, quantize_weight, wo_matmul,
)


@dataclasses.dataclass(frozen=True)
class LlamaConfig:
    vocab_size: int = 32000
    dim: int = 4096
    n_layers: int = 32
    n_heads: int = 32
    n_kv_heads: int = 32
    intermediate: int = 11008
    rope_theta: float = 10000.0
    norm_eps: float = 1e-5
    max_seq: int = 2048
    dtype: Any = jnp.bfloat16

    @property
    def head_dim(self) -> int:
        return self.dim // self.n_heads

    @staticmethod
    def llama2_7b(**kw) -> "LlamaConfig":
        return LlamaConfig(**kw)

    @staticmethod
    def llama2_70b(**kw) -> "LlamaConfig":
        return LlamaConfig(dim=8192, n_layers=80, n_heads=64, n_kv_heads=8,
                           intermediate=28672, **kw)

    @staticmethod
    def tiny(**kw) -> "LlamaConfig":
        return LlamaConfig(vocab_size=256, dim=64, n_layers=2, n_heads=4,
                           n_kv_heads=2, intermediate=128, max_seq=64, **kw)


# ---------------------------------------------------------------------------
# params
# ---------------------------------------------------------------------------

def init_llama_params(cfg: LlamaConfig, key: jax.Array,
                      dtype=None) -> dict:
    dtype = dtype or cfg.dtype
    keys = iter(jax.random.split(key, cfg.n_layers * 7 + 3))

    def dense(k, din, dout):
        scale = 1.0 / math.sqrt(din)
        return (jax.random.normal(k, (din, dout), jnp.float32) * scale
                ).astype(dtype)

    layers = []
    kvd = cfg.n_kv_heads * cfg.head_dim
    for _ in range(cfg.n_layers):
        layers.append({
            "attn_norm": jnp.ones((cfg.dim,), dtype),
            "wq": dense(next(keys), cfg.dim, cfg.dim),
            "wk": dense(next(keys), cfg.dim, kvd),
            "wv": dense(next(keys), cfg.dim, kvd),
            "wo": dense(next(keys), cfg.dim, cfg.dim),
            "mlp_norm": jnp.ones((cfg.dim,), dtype),
            "w_gate": dense(next(keys), cfg.dim, cfg.intermediate),
            "w_up": dense(next(keys), cfg.dim, cfg.intermediate),
            "w_down": dense(next(keys), cfg.intermediate, cfg.dim),
        })
    return {
        "embed": dense(next(keys), cfg.vocab_size, cfg.dim),
        "final_norm": jnp.ones((cfg.dim,), dtype),
        "lm_head": dense(next(keys), cfg.dim, cfg.vocab_size),
        "layers": layers,
    }


_QUANT_KEYS = ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down")


def quantize_llama_params(params: dict, bits: int = 8,
                          group_size: Optional[int] = None,
                          fuse: bool = True,
                          paired: bool = False) -> dict:
    """Weight-only quantize all layer matmuls (+ lm_head).

    fuse=True additionally concatenates Q/K/V and gate/up into single
    quantized matrices ("wqkv", "w_gateup") — fewer, larger decode kernels
    (the Megatron fused-QKV layout; reference reaches the same via its
    parallel-matmul merge mutator).

    paired=True (int4): paired split-half scale groups for the slab
    kernel (quantize_weight paired; effective group doubles — the
    accuracy gate covers this config, docs/PPL_GATE_V3.json)."""
    from infinitensor_tpu.quant.weight_only import concat_qlinear
    kw = {"paired": paired} if (paired and bits == 4) else {}
    out = {"embed": params["embed"], "final_norm": params["final_norm"],
           "lm_head": quantize_weight(params["lm_head"], bits, group_size,
                                      **kw),
           "layers": []}
    for layer in params["layers"]:
        ql = {k: v for k, v in layer.items() if k not in _QUANT_KEYS}
        qw = {k: quantize_weight(layer[k], bits, group_size, **kw)
              for k in _QUANT_KEYS}
        if fuse:
            ql["wqkv"] = concat_qlinear(qw["wq"], qw["wk"], qw["wv"])
            ql["w_gateup"] = concat_qlinear(qw["w_gate"], qw["w_up"])
            ql["wo"] = qw["wo"]
            ql["w_down"] = qw["w_down"]
        else:
            ql.update(qw)
        out["layers"].append(ql)
    return out


def _linear(x, w):
    if isinstance(w, QuantizedLinear):
        return wo_matmul(x, w)
    return jnp.matmul(x, w, preferred_element_type=jnp.float32).astype(x.dtype)


def _linear_norm(x, norm_w, w, eps):
    """rmsnorm(x)*norm_w @ w, fused into the Pallas kernel on TPU for
    quantized weights (the standalone norm kernel between matmuls costs a
    launch + HBM round trip XLA cannot fuse into a custom call)."""
    from infinitensor_tpu.utils.platform import use_pallas

    if isinstance(w, QuantizedLinear) and use_pallas() \
            and x.shape[-1] >= 512:
        from infinitensor_tpu.kernels.quant_matmul import quant_matmul_norm
        return quant_matmul_norm(x, norm_w, w, eps=eps)
    return _linear(rmsnorm(x, norm_w, eps), w)


# ---------------------------------------------------------------------------
# building blocks
# ---------------------------------------------------------------------------

def rmsnorm(x, w, eps):
    x32 = x.astype(jnp.float32)
    ms = jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
    return (x32 * jax.lax.rsqrt(ms + eps)).astype(x.dtype) * w


def rope(x, pos, theta: float):
    """Rotate-half RoPE. x: [B, S, H, D]; pos: [B, S] int32."""
    B, S, H, D = x.shape
    half = D // 2
    inv_freq = jnp.power(theta, -jnp.arange(0, half, dtype=jnp.float32)
                         * 2.0 / D)
    ang = pos.astype(jnp.float32)[:, :, None, None] * inv_freq  # [B,S,1,half]
    cos, sin = jnp.cos(ang), jnp.sin(ang)
    x1, x2 = x[..., :half].astype(jnp.float32), x[..., half:].astype(jnp.float32)
    return jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin],
                           axis=-1).astype(x.dtype)


def init_kv_cache(cfg: LlamaConfig, batch: int, max_seq: Optional[int] = None,
                  dtype=None, kv_quant: bool = False) -> dict:
    """Per-layer list layout: each layer's K/V is its own [B, Hkv, S, D]
    buffer so donation keeps every update a true in-place HBM write (a
    stacked [L, ...] array would force XLA to re-materialize the stack
    every step — measured at ~2 GB/step of pure copy traffic for 7B)."""
    S = max_seq or cfg.max_seq
    dtype = dtype or cfg.dtype
    shape = (batch, cfg.n_kv_heads, S, cfg.head_dim)
    if kv_quant:
        return {"k": [jnp.zeros(shape, jnp.int8) for _ in range(cfg.n_layers)],
                "v": [jnp.zeros(shape, jnp.int8) for _ in range(cfg.n_layers)],
                "k_scale": [jnp.zeros(shape[:-1], jnp.float32)
                            for _ in range(cfg.n_layers)],
                "v_scale": [jnp.zeros(shape[:-1], jnp.float32)
                            for _ in range(cfg.n_layers)]}
    return {"k": [jnp.zeros(shape, dtype) for _ in range(cfg.n_layers)],
            "v": [jnp.zeros(shape, dtype) for _ in range(cfg.n_layers)]}


def init_paged_kv_cache(cfg: LlamaConfig, n_pages: int, page_size: int,
                        max_slots: int, max_seq: Optional[int] = None,
                        dtype=None, kv_quant: bool = False) -> dict:
    """Paged cache dict (vLLM-style; serving/paged_cache.py manages the
    host-side free list). llama_decode_step dispatches on 'k_pages';
    kv_quant adds INT8 pages + per-row f32 scale pages ('ks_pages')."""
    from infinitensor_tpu.serving.paged_cache import init_paged_cache
    c = init_paged_cache(cfg.n_layers, n_pages, cfg.n_kv_heads, page_size,
                         cfg.head_dim, max_slots, max_seq or cfg.max_seq,
                         jnp.int8 if kv_quant else (dtype or cfg.dtype))
    out = {"k_pages": c.k_pages, "v_pages": c.v_pages,
           "block_table": c.block_table}
    if kv_quant:
        sshape = (n_pages, cfg.n_kv_heads, page_size)
        out["ks_pages"] = [jnp.zeros(sshape, jnp.float32)
                           for _ in range(cfg.n_layers)]
        out["vs_pages"] = [jnp.zeros(sshape, jnp.float32)
                           for _ in range(cfg.n_layers)]
    return out


def _attention(q, k, v, mask):
    """q [B,S,H,D], k/v [B,T,Hkv,D] -> [B,S,H,D]. GQA via head grouping."""
    B, S, H, D = q.shape
    T, Hkv = k.shape[1], k.shape[2]
    rep = H // Hkv
    qf = q.astype(jnp.float32).reshape(B, S, Hkv, rep, D)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    scores = jnp.einsum("bshrd,bthd->bhrst", qf, kf) / math.sqrt(D)
    scores = jnp.where(mask[:, None, None, :, :], scores, -1e30)
    p = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhrst,bthd->bshrd", p, vf)
    return out.reshape(B, S, H, D).astype(q.dtype)


# ---------------------------------------------------------------------------
# forward passes
# ---------------------------------------------------------------------------

def _block_prefill(cfg, layer, x, pos, cache_k, cache_v, layer_idx,
                   k_scale=None, v_scale=None):
    B, S, _ = x.shape
    h = rmsnorm(x, layer["attn_norm"], cfg.norm_eps)
    q, k, v = _qkv(cfg, layer, h)
    q = rope(q, pos, cfg.rope_theta)
    k = rope(k, pos, cfg.rope_theta)
    # write K/V into the cache at positions [0, S)
    kh = jnp.swapaxes(k, 1, 2)
    vh = jnp.swapaxes(v, 1, 2)
    if k_scale is not None:
        from infinitensor_tpu.kernels.attention import quantize_kv_row
        kq, ks = quantize_kv_row(kh)
        vq, vs = quantize_kv_row(vh)
        cache_k = jax.lax.dynamic_update_slice(cache_k, kq, (0, 0, 0, 0))
        cache_v = jax.lax.dynamic_update_slice(cache_v, vq, (0, 0, 0, 0))
        k_scale = jax.lax.dynamic_update_slice(
            k_scale, ks.astype(k_scale.dtype), (0, 0, 0))
        v_scale = jax.lax.dynamic_update_slice(
            v_scale, vs.astype(v_scale.dtype), (0, 0, 0))
    else:
        cache_k = jax.lax.dynamic_update_slice(
            cache_k, kh.astype(cache_k.dtype), (0, 0, 0, 0))
        cache_v = jax.lax.dynamic_update_slice(
            cache_v, vh.astype(cache_v.dtype), (0, 0, 0, 0))
    # blockwise flash attention on TPU (never materializes [S, S] scores);
    # falls back to the jnp oracle on CPU / odd shapes inside the call
    from infinitensor_tpu.kernels.flash_attention import flash_attention
    rep = cfg.n_heads // cfg.n_kv_heads
    kf = kh if rep == 1 else jnp.repeat(kh, rep, axis=1)
    vf = vh if rep == 1 else jnp.repeat(vh, rep, axis=1)
    attn = jnp.swapaxes(
        flash_attention(jnp.swapaxes(q, 1, 2), kf, vf, causal=True), 1, 2)
    x = x + _linear(attn.reshape(B, S, cfg.dim), layer["wo"])
    h2 = rmsnorm(x, layer["mlp_norm"], cfg.norm_eps)
    x = x + _mlp(cfg, layer, h2)
    return x, cache_k, cache_v, k_scale, v_scale


def llama_prefill(params, cfg: LlamaConfig, tokens, cache):
    """tokens [B, S] int32 -> (logits [B, S, vocab], cache')."""
    B, S = tokens.shape
    x = jnp.take(params["embed"], tokens, axis=0)
    pos = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32)[None], (B, S))
    quant_cache = "k_scale" in cache
    new = {key: [] for key in cache}
    for i, layer in enumerate(params["layers"]):
        ks = cache["k_scale"][i] if quant_cache else None
        vs = cache["v_scale"][i] if quant_cache else None
        x, ck, cv, ks, vs = _block_prefill(cfg, layer, x, pos, cache["k"][i],
                                           cache["v"][i], i, ks, vs)
        new["k"].append(ck)
        new["v"].append(cv)
        if quant_cache:
            new["k_scale"].append(ks)
            new["v_scale"].append(vs)
    x = rmsnorm(x, params["final_norm"], cfg.norm_eps)
    logits = _linear(x, params["lm_head"])
    return logits, new


def _qkv(cfg, layer, h, norm_w=None, eps=1e-5):
    """Project to q/k/v, using the fused QKV matrix when present. With
    norm_w given, h is the RAW residual and the rmsnorm fuses into the
    matmul kernel (_linear_norm)."""
    B, S, _ = h.shape
    kvd = cfg.n_kv_heads * cfg.head_dim

    def lin(w):
        if norm_w is not None:
            return _linear_norm(h, norm_w, w, eps)
        return _linear(h, w)

    if "wqkv" in layer:
        qkv = lin(layer["wqkv"])
        q = qkv[..., :cfg.dim]
        k = qkv[..., cfg.dim:cfg.dim + kvd]
        v = qkv[..., cfg.dim + kvd:]
    else:
        q = lin(layer["wq"])
        k = lin(layer["wk"])
        v = lin(layer["wv"])
    return (q.reshape(B, S, cfg.n_heads, cfg.head_dim),
            k.reshape(B, S, cfg.n_kv_heads, cfg.head_dim),
            v.reshape(B, S, cfg.n_kv_heads, cfg.head_dim))


def _mlp(cfg, layer, h2, norm_w=None, eps=1e-5):
    """SwiGLU MLP; with norm_w given, h2 is the RAW residual and the
    rmsnorm fuses into the gate/up matmul kernel."""
    def lin(h, w):
        if norm_w is not None:
            return _linear_norm(h, norm_w, w, eps)
        return _linear(h, w)

    if "w_gateup" in layer:
        gu = lin(h2, layer["w_gateup"]).astype(jnp.float32)
        gate, up = gu[..., :cfg.intermediate], gu[..., cfg.intermediate:]
        gate = jax.nn.silu(gate)
    else:
        gate = jax.nn.silu(lin(h2, layer["w_gate"]).astype(jnp.float32))
        up = lin(h2, layer["w_up"]).astype(jnp.float32)
    return _linear((gate * up).astype(h2.dtype), layer["w_down"])


def _block_decode(cfg, layer, x, pos, cache_k, cache_v, k_scale=None,
                  v_scale=None):
    """x [B, 1, dim]; pos [B] current positions; cache [B,Hkv,Smax,D].
    When k_scale/v_scale are given the cache is INT8 with per-(b,h,s)
    scales (BASELINE INT8 KV cache)."""
    B = x.shape[0]
    q, k, v = _qkv(cfg, layer, x, norm_w=layer["attn_norm"],
                   eps=cfg.norm_eps)
    pos2 = pos[:, None]
    q = rope(q, pos2, cfg.rope_theta)
    k = rope(k, pos2, cfg.rope_theta)

    # fused decode attention with in-cache append (Pallas on TPU)
    from infinitensor_tpu.kernels.attention import (
        decode_attention_gqa, decode_attention_gqa_q8)
    qh = jnp.swapaxes(q, 1, 2)                      # [B, H, 1, D]
    kh = jnp.swapaxes(k, 1, 2)
    vh = jnp.swapaxes(v, 1, 2)
    if k_scale is not None:
        out, cache_k, cache_v, k_scale, v_scale = decode_attention_gqa_q8(
            cache_k, cache_v, k_scale, v_scale, qh, kh, vh, pos)
    else:
        out, cache_k, cache_v = decode_attention_gqa(
            cache_k, cache_v, qh, kh.astype(cache_k.dtype),
            vh.astype(cache_v.dtype), pos)
    attn = jnp.swapaxes(out, 1, 2).reshape(B, 1, cfg.dim)
    x = x + _linear(attn, layer["wo"])
    x = x + _mlp(cfg, layer, x, norm_w=layer["mlp_norm"],
                 eps=cfg.norm_eps)
    return x, cache_k, cache_v, k_scale, v_scale


def _block_decode_paged(cfg, layer, x, pos, k_pages, v_pages, table,
                        ks_pages=None, vs_pages=None):
    """Decode block against a paged KV cache (kernels/paged_attention.py).
    When ks_pages/vs_pages are given the pages are INT8 with per-row f32
    scales (paged_append_q8 / paged_flash_decode_q8)."""
    from infinitensor_tpu.kernels.paged_attention import (
        paged_append, paged_append_q8, paged_flash_decode,
        paged_flash_decode_q8)
    B = x.shape[0]
    h = rmsnorm(x, layer["attn_norm"], cfg.norm_eps)
    q, k, v = _qkv(cfg, layer, h)
    pos2 = pos[:, None]
    q = rope(q, pos2, cfg.rope_theta)
    k = rope(k, pos2, cfg.rope_theta)
    qh = jnp.swapaxes(q, 1, 2)
    if ks_pages is not None:
        kh = jnp.swapaxes(k, 1, 2)
        vh = jnp.swapaxes(v, 1, 2)
        k_pages, v_pages, ks_pages, vs_pages = paged_append_q8(
            k_pages, v_pages, ks_pages, vs_pages, kh, vh, table, pos)
        out = paged_flash_decode_q8(qh, k_pages, v_pages, ks_pages,
                                    vs_pages, table, pos)
    else:
        kh = jnp.swapaxes(k, 1, 2).astype(k_pages.dtype)
        vh = jnp.swapaxes(v, 1, 2).astype(v_pages.dtype)
        k_pages, v_pages = paged_append(k_pages, v_pages, kh, vh, table, pos)
        out = paged_flash_decode(qh, k_pages, v_pages, table, pos)
    attn = jnp.swapaxes(out, 1, 2).reshape(B, 1, cfg.dim)
    x = x + _linear(attn, layer["wo"])
    h2 = rmsnorm(x, layer["mlp_norm"], cfg.norm_eps)
    x = x + _mlp(cfg, layer, h2)
    return x, k_pages, v_pages, ks_pages, vs_pages


def llama_decode_step(params, cfg: LlamaConfig, token, pos, cache):
    """One decode step. token [B] int32, pos [B] int32 (write positions).

    Returns (logits [B, vocab], cache'). Jit with cache donated:
    ``jax.jit(..., donate_argnums=(4,))``.

    Cache dispatch: dense bf16 ('k'/'v'), INT8 quantized (+'k_scale'),
    or paged ('k_pages'/'v_pages'/'block_table').
    """
    B = token.shape[0]
    if "k_pages" in cache:
        x = jnp.take(params["embed"], token, axis=0)[:, None, :]
        table = cache["block_table"]
        q8 = "ks_pages" in cache
        new = {key: [] for key in cache}
        new["block_table"] = table
        for i, layer in enumerate(params["layers"]):
            x, kp, vp, ksp, vsp = _block_decode_paged(
                cfg, layer, x, pos, cache["k_pages"][i],
                cache["v_pages"][i], table,
                cache["ks_pages"][i] if q8 else None,
                cache["vs_pages"][i] if q8 else None)
            new["k_pages"].append(kp)
            new["v_pages"].append(vp)
            if q8:
                new["ks_pages"].append(ksp)
                new["vs_pages"].append(vsp)
        x = rmsnorm(x, params["final_norm"], cfg.norm_eps)
        return _linear(x[:, 0], params["lm_head"]), new
    x = jnp.take(params["embed"], token, axis=0)[:, None, :]
    quant_cache = "k_scale" in cache
    new = {key: [] for key in cache}
    for i, layer in enumerate(params["layers"]):
        ks = cache["k_scale"][i] if quant_cache else None
        vs = cache["v_scale"][i] if quant_cache else None
        x, ck, cv, ks, vs = _block_decode(cfg, layer, x, pos, cache["k"][i],
                                          cache["v"][i], ks, vs)
        new["k"].append(ck)
        new["v"].append(cv)
        if quant_cache:
            new["k_scale"].append(ks)
            new["v_scale"].append(vs)
    x = rmsnorm(x, params["final_norm"], cfg.norm_eps)
    logits = _linear(x[:, 0], params["lm_head"])
    return logits, new


def _block_verify(cfg, layer, x, positions, pos0, cache_k, cache_v,
                  k_scale=None, v_scale=None):
    """Multi-token decode block for speculative verification. x [B, K, dim];
    positions [B, K] = pos0[:, None] + arange(K). Writes K/V rows for ALL K
    positions (per-slot offset pos0), then each token attends to cache rows
    <= its own position — rows past the later-accepted prefix are dead until
    overwritten, exactly like a rolled-back decode."""
    B, K, _ = x.shape
    S = cache_k.shape[2]
    h = rmsnorm(x, layer["attn_norm"], cfg.norm_eps)
    q, k, v = _qkv(cfg, layer, h)
    q = rope(q, positions, cfg.rope_theta)
    k = rope(k, positions, cfg.rope_theta)
    kh = jnp.swapaxes(k, 1, 2)                     # [B, Hkv, K, D]
    vh = jnp.swapaxes(v, 1, 2)

    def put3(c, rows, p):                          # per-slot row write
        return jax.lax.dynamic_update_slice(c, rows, (0, p, 0))

    if k_scale is not None:
        from infinitensor_tpu.kernels.attention import quantize_kv_row
        kq, ks = quantize_kv_row(kh)
        vq, vs = quantize_kv_row(vh)
        cache_k = jax.vmap(put3)(cache_k, kq, pos0)
        cache_v = jax.vmap(put3)(cache_v, vq, pos0)

        def put2(c, rows, p):
            return jax.lax.dynamic_update_slice(c, rows, (0, p))

        k_scale = jax.vmap(put2)(k_scale, ks.astype(k_scale.dtype), pos0)
        v_scale = jax.vmap(put2)(v_scale, vs.astype(v_scale.dtype), pos0)
        kf = cache_k.astype(jnp.float32) * k_scale[..., None]
        vf = cache_v.astype(jnp.float32) * v_scale[..., None]
    else:
        cache_k = jax.vmap(put3)(cache_k, kh.astype(cache_k.dtype), pos0)
        cache_v = jax.vmap(put3)(cache_v, vh.astype(cache_v.dtype), pos0)
        kf, vf = cache_k, cache_v

    cols = jnp.arange(S, dtype=jnp.int32)
    mask = cols[None, None, :] <= positions[:, :, None]      # [B, K, S]
    attn = _attention(q, jnp.swapaxes(kf, 1, 2).astype(q.dtype),
                      jnp.swapaxes(vf, 1, 2).astype(q.dtype), mask)
    x = x + _linear(attn.reshape(B, K, cfg.dim), layer["wo"])
    h2 = rmsnorm(x, layer["mlp_norm"], cfg.norm_eps)
    x = x + _mlp(cfg, layer, h2)
    return x, cache_k, cache_v, k_scale, v_scale


def llama_verify_step(params, cfg: LlamaConfig, tokens, pos, cache):
    """Speculative-decoding verify pass: score K proposed tokens per slot in
    ONE fused forward. tokens [B, K] int32 (token j is the model input at
    write position pos+j); pos [B] int32. Returns (logits [B, K, vocab],
    cache'). Rejected rows need no rollback — the per-position masks above
    (and the frontier clamp in the decode kernels) make rows past `pos`
    invisible, so not advancing `pos` IS the rollback. The reference has no
    speculative path; its closest machinery is the fused decode kernel
    (src/kernels/cuda/attention_kvcache.cu) which this generalizes to K>1."""
    B, K = tokens.shape
    x = jnp.take(params["embed"], tokens, axis=0)
    positions = pos[:, None] + jnp.arange(K, dtype=jnp.int32)[None]
    quant_cache = "k_scale" in cache
    new = {key: [] for key in cache}
    for i, layer in enumerate(params["layers"]):
        ks = cache["k_scale"][i] if quant_cache else None
        vs = cache["v_scale"][i] if quant_cache else None
        x, ck, cv, ks, vs = _block_verify(cfg, layer, x, positions, pos,
                                          cache["k"][i], cache["v"][i],
                                          ks, vs)
        new["k"].append(ck)
        new["v"].append(cv)
        if quant_cache:
            new["k_scale"].append(ks)
            new["v_scale"].append(vs)
    x = rmsnorm(x, params["final_norm"], cfg.norm_eps)
    return _linear(x, params["lm_head"]), new


def greedy_generate(params, cfg: LlamaConfig, prompt_tokens, n_steps: int,
                    cache=None):
    """Reference-style greedy decode loop (llama_kvcache_inference.py
    analog). Returns [B, n_steps] generated ids."""
    B, S = prompt_tokens.shape
    if cache is None:
        cache = init_kv_cache(cfg, B)
    logits, cache = jax.jit(llama_prefill, static_argnums=1)(
        params, cfg, prompt_tokens, cache)
    token = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
    step = jax.jit(llama_decode_step, static_argnums=1, donate_argnums=4)
    outs = [token]
    pos = jnp.full((B,), S, jnp.int32)
    for _ in range(n_steps - 1):
        logits, cache = step(params, cfg, token, pos, cache)
        token = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        outs.append(token)
        pos = pos + 1
    return jnp.stack(outs, axis=1), cache


def llama_decode_multi(params, cfg: LlamaConfig, token, pos, cache,
                       n_steps: int):
    """N autoregressive greedy decode steps fused into ONE executable via
    lax.scan. On a tunneled/remote TPU the per-executable dispatch latency
    can rival the per-token compute at bs=1; scanning amortizes it N-fold
    (there is no reference analog — CUDA-Graph replay, reference
    src/cuda/cuda_runtime.cc:351-426, attacks the same per-launch overhead).

    Returns (tokens [B, n_steps], last_token, next_pos, cache)."""
    def body(carry, _):
        tok, p, c = carry
        logits, c = llama_decode_step(params, cfg, tok, p, c)
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return (nxt, p + 1, c), nxt

    (token, pos, cache), toks = jax.lax.scan(
        body, (token, pos, cache), length=n_steps)
    return jnp.moveaxis(toks, 0, 1), token, pos, cache
