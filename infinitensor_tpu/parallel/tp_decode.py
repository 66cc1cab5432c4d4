"""Explicit shard_map tensor-parallel decode for the quantized Llama
family — the REAL multi-chip path for Pallas kernels.

GSPMD (llama_sharding.py) partitions plain-jnp models well, but a Pallas
``pallas_call`` is opaque to the partitioner: the production TP path runs
each chip's quant-matmul kernel on its LOCAL weight shard inside
``shard_map`` and inserts the Megatron collectives explicitly —

  wqkv / w_gateup : column-parallel (out dim / tp; heads stay chip-local)
  wo / w_down     : row-parallel   (in dim / tp) -> partial -> psum
  attention       : chip-local (Hkv/tp KV heads, H/tp query heads)
  lm_head         : column-parallel -> all_gather(vocab shards)

Per token this is exactly 2 psum([B, 1, dim] bf16) per layer plus one
lm_head gather — the analytic ICI budget docs/SCALING_70B.json audits.
The reference reaches the same placement by per-rank ONNX surgery +
NCCL AllReduce inserts (examples/distributed/parallel_opt.py:196-209);
here the collectives ride ICI via XLA's psum inside shard_map.

Parity invariant: per-group quantization groups run along the
contraction dim, so as long as group_size divides the shard, quantizing
a float shard equals sharding the quantized tensor — the TP model is
numerically the single-chip model (tests/test_tp_decode.py).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from infinitensor_tpu.models.llama import LlamaConfig
from infinitensor_tpu.quant.weight_only import QuantizedLinear, \
    quantize_weight


# ---------------------------------------------------------------------------
# host-side param sharding (float -> per-rank quantized shards)
# ---------------------------------------------------------------------------

def make_tp_quant_params(params: dict, cfg: LlamaConfig, tp: int,
                         bits: int = 4, group_size: int = 128) -> dict:
    """Shard a FLOAT models/llama.py param pytree into a stacked-by-rank
    quantized pytree: every linear becomes a rank-stacked QuantizedLinear
    whose leaves carry a leading [tp] axis (feed through shard_map with
    P('tp') on that axis). Column shards split q/k/v (and gate/up)
    SEGMENT-wise so heads stay rank-local."""
    assert cfg.n_heads % tp == 0 and cfg.n_kv_heads % tp == 0, \
        "head counts must divide tp"
    assert cfg.dim % tp == 0 and cfg.intermediate % tp == 0

    def q(w):
        ql = quantize_weight(w, bits=bits, group_size=group_size)
        assert not ql.out_logical, "sharded layout requires no padding"
        return ql

    def stack(qls):
        return QuantizedLinear(
            jnp.stack([x.qweight for x in qls]),
            jnp.stack([x.scales for x in qls]),
            qls[0].bits, qls[0].group_size)

    def col(w, segments=1):
        """Column-parallel: split out dim into tp blocks; with segments>1
        (fused qkv / gateup) each segment splits independently and the
        rank keeps the concatenation of its per-segment blocks."""
        din, dout = w.shape
        segs = jnp.split(w, segments, axis=1) if segments > 1 else [w]
        shards = []
        for r in range(tp):
            parts = []
            for s in segs:
                n = s.shape[1] // tp
                parts.append(s[:, r * n:(r + 1) * n])
            shards.append(q(jnp.concatenate(parts, axis=1)
                            if len(parts) > 1 else parts[0]))
        return stack(shards)

    def row(w):
        din, dout = w.shape
        n = din // tp
        assert n % group_size == 0, \
            "group_size must divide the row shard for parity"
        return stack([q(w[r * n:(r + 1) * n, :]) for r in range(tp)])

    out = {"embed": params["embed"], "final_norm": params["final_norm"],
           "lm_head": col(params["lm_head"]), "layers": []}
    for layer in params["layers"]:
        wqkv = jnp.concatenate(
            [layer["wq"], layer["wk"], layer["wv"]], axis=1)
        # segment boundaries differ (dim vs kvd): shard each separately
        dim, kvd = cfg.dim, cfg.n_kv_heads * cfg.head_dim
        shards = []
        for r in range(tp):
            nq, nk = dim // tp, kvd // tp
            parts = [layer["wq"][:, r * nq:(r + 1) * nq],
                     layer["wk"][:, r * nk:(r + 1) * nk],
                     layer["wv"][:, r * nk:(r + 1) * nk]]
            shards.append(q(jnp.concatenate(parts, axis=1)))
        ql = {"attn_norm": layer["attn_norm"],
              "mlp_norm": layer["mlp_norm"],
              "wqkv": stack(shards),
              "wo": row(layer["wo"]),
              "w_gateup": col(jnp.concatenate(
                  [layer["w_gate"], layer["w_up"]], axis=1), segments=2),
              "w_down": row(layer["w_down"])}
        out["layers"].append(ql)
    return out


def tp_param_specs(params: dict) -> dict:
    """P('tp') on the stacked leading axis of every rank-stacked leaf;
    replicated otherwise."""
    def spec(v):
        if isinstance(v, QuantizedLinear):
            return QuantizedLinear(P("tp", None, None), P("tp", None, None),
                                   v.bits, v.group_size, v.out_logical)
        return P()

    return {
        "embed": P(), "final_norm": P(),
        "lm_head": spec(params["lm_head"]),
        "layers": [{k: spec(v) for k, v in layer.items()}
                   for layer in params["layers"]],
    }


# ---------------------------------------------------------------------------
# shard_map decode step
# ---------------------------------------------------------------------------

def make_tp_decode_step(cfg: LlamaConfig, mesh: Mesh, tp_axis: str = "tp",
                        dp_axis: Optional[str] = "dp",
                        kv_quant: bool = True):
    """Build fn(params_stacked, token, pos, cache) -> (logits, cache')
    running Megatron TP inside shard_map. Cache leaves are [B, Hkv/tp
    local heads...] per rank via P(dp, 'tp') on the head axis; batch is
    sharded over dp (zero cross-dp collectives in decode)."""
    from jax.experimental.shard_map import shard_map
    from infinitensor_tpu.kernels.attention import (
        decode_attention_gqa, decode_attention_gqa_q8)
    from infinitensor_tpu.kernels.quant_matmul import quant_matmul
    from infinitensor_tpu.models.llama import rmsnorm, rope

    tp = mesh.shape[tp_axis]
    H_l, Hkv_l = cfg.n_heads // tp, cfg.n_kv_heads // tp
    D, dim = cfg.head_dim, cfg.dim
    kvd_l = Hkv_l * D

    def qmm(x, ql: QuantizedLinear):
        return quant_matmul(x, ql)

    def local_step(params, token, pos, cache):
        B = token.shape[0]
        x = jnp.take(params["embed"], token, axis=0)[:, None, :]
        x = x.astype(cfg.dtype)
        new = {k: [] for k in cache}
        for i, layer in enumerate(params["layers"]):
            hn = rmsnorm(x, layer["attn_norm"], cfg.norm_eps)
            qkv = qmm(hn, layer["wqkv"])          # [B,1,(dim+2kvd)/tp]
            q = qkv[..., :H_l * D]
            k = qkv[..., H_l * D:H_l * D + kvd_l]
            v = qkv[..., H_l * D + kvd_l:]
            pos2 = pos[:, None]
            q = rope(q.reshape(B, 1, H_l, D), pos2, cfg.rope_theta)
            k = rope(k.reshape(B, 1, Hkv_l, D), pos2, cfg.rope_theta)
            v = v.reshape(B, 1, Hkv_l, D)
            qh = jnp.swapaxes(q, 1, 2)
            kh = jnp.swapaxes(k, 1, 2)
            vh = jnp.swapaxes(v, 1, 2)
            if kv_quant:
                out, ck, cv, ks, vs = decode_attention_gqa_q8(
                    cache["k"][i], cache["v"][i], cache["k_scale"][i],
                    cache["v_scale"][i], qh, kh, vh, pos)
                new["k_scale"].append(ks)
                new["v_scale"].append(vs)
            else:
                out, ck, cv = decode_attention_gqa(
                    cache["k"][i], cache["v"][i], qh, kh, vh, pos)
            new["k"].append(ck)
            new["v"].append(cv)
            att = jnp.swapaxes(out, 1, 2).reshape(B, 1, H_l * D)
            att = att.astype(cfg.dtype)
            # row-parallel wo: local partial -> psum (Megatron AllReduce)
            x = x + jax.lax.psum(qmm(att, layer["wo"]), tp_axis)
            h2 = rmsnorm(x, layer["mlp_norm"], cfg.norm_eps)
            gu = qmm(h2, layer["w_gateup"]).astype(jnp.float32)
            inter_l = cfg.intermediate // tp
            act = jax.nn.silu(gu[..., :inter_l]) * gu[..., inter_l:]
            x = x + jax.lax.psum(
                qmm(act.astype(cfg.dtype), layer["w_down"]), tp_axis)
        xf = rmsnorm(x, params["final_norm"], cfg.norm_eps)
        logits_l = qmm(xf.reshape(B, dim), params["lm_head"])
        # column-parallel lm_head: gather the vocab shards (tiny)
        logits = jax.lax.all_gather(logits_l, tp_axis, axis=1, tiled=True)
        return logits, new

    def step(params, token, pos, cache):
        pspecs = tp_param_specs(params)
        use_dp = (dp_axis and dp_axis in mesh.shape
                  and mesh.shape[dp_axis] > 1)
        b_spec = P(dp_axis) if use_dp else P()
        # cache leaves [B, Hkv, S, D] / scales [B, Hkv, S]: batch over dp,
        # heads over tp
        cache_spec = jax.tree_util.tree_map(
            lambda _: P(dp_axis if use_dp else None, tp_axis), cache)

        def strip_stack(p):
            # inside shard_map each rank sees [1, ...] stacked leaves;
            # drop the rank axis
            def go(v):
                if isinstance(v, QuantizedLinear):
                    return QuantizedLinear(v.qweight[0], v.scales[0],
                                           v.bits, v.group_size,
                                           v.out_logical)
                return v
            return {
                "embed": p["embed"], "final_norm": p["final_norm"],
                "lm_head": go(p["lm_head"]),
                "layers": [{k: go(v) for k, v in layer.items()}
                           for layer in p["layers"]],
            }

        fn = shard_map(
            lambda p, t, ps, c: local_step(strip_stack(p), t, ps, c),
            mesh=mesh,
            in_specs=(pspecs, b_spec, b_spec, cache_spec),
            out_specs=(b_spec, cache_spec),
            check_rep=False)
        return fn(params, token, pos, cache)

    return step


def make_tp_float_params(params: dict, cfg: LlamaConfig, tp: int) -> dict:
    """Rank-stack FLOAT (bf16) Megatron shards of a models/llama.py param
    pytree — the PREFILL-side layout (prefill is compute-bound, so it runs
    bf16 while decode streams the quantized shards; docs/PREFILL_MFU.json).
    Column shards split q/k/v and gate/up segment-wise (heads rank-local),
    matching make_tp_quant_params."""
    assert cfg.n_heads % tp == 0 and cfg.n_kv_heads % tp == 0
    assert cfg.dim % tp == 0 and cfg.intermediate % tp == 0

    def col_seg(ws):
        """shard each segment's out dim, concat rank parts, stack."""
        shards = []
        for r in range(tp):
            parts = []
            for w in ws:
                n = w.shape[1] // tp
                parts.append(w[:, r * n:(r + 1) * n])
            shards.append(jnp.concatenate(parts, axis=1)
                          if len(parts) > 1 else parts[0])
        return jnp.stack(shards)

    def row(w):
        n = w.shape[0] // tp
        return jnp.stack([w[r * n:(r + 1) * n, :] for r in range(tp)])

    out = {"embed": params["embed"], "final_norm": params["final_norm"],
           "lm_head": col_seg([params["lm_head"]]), "layers": []}
    for layer in params["layers"]:
        out["layers"].append({
            "attn_norm": layer["attn_norm"],
            "mlp_norm": layer["mlp_norm"],
            "wqkv": col_seg([layer["wq"], layer["wk"], layer["wv"]]),
            "wo": row(layer["wo"]),
            "w_gateup": col_seg([layer["w_gate"], layer["w_up"]]),
            "w_down": row(layer["w_down"])})
    return out


def make_tp_prefill_step(cfg: LlamaConfig, mesh: Mesh, tp_axis: str = "tp",
                         dp_axis: Optional[str] = "dp",
                         kv_quant: bool = True):
    """Explicit shard_map Megatron TP PREFILL: fn(params_stacked, tokens
    [B, S], cache) -> (last-position logits [B, vocab], cache').

    The admission-side counterpart of make_tp_decode_step: per layer the
    collective set is 2 psum([B, S, dim] bf16) (row-parallel wo/w_down
    partials — S x the decode payload) plus one last-token lm_head vocab
    gather; attention runs on rank-local heads (flash_attention kernel)
    and the written KV shards land in the rank-local cache heads, ready
    for the TP decode path. tools/scaling_report_v2.py audits this step's
    compiled HLO for the 70B prefill budget (SCALING_70B v3)."""
    from jax.experimental.shard_map import shard_map
    from infinitensor_tpu.kernels.attention import quantize_kv_row
    from infinitensor_tpu.kernels.flash_attention import flash_attention
    from infinitensor_tpu.models.llama import rmsnorm, rope

    tp = mesh.shape[tp_axis]
    H_l, Hkv_l = cfg.n_heads // tp, cfg.n_kv_heads // tp
    D, dim = cfg.head_dim, cfg.dim
    kvd_l = Hkv_l * D
    rep = H_l // Hkv_l

    def local_prefill(params, tokens, cache):
        B, S = tokens.shape
        x = jnp.take(params["embed"], tokens, axis=0).astype(cfg.dtype)
        pos = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32)[None], (B, S))
        new = {k: [] for k in cache}
        for i, layer in enumerate(params["layers"]):
            hn = rmsnorm(x, layer["attn_norm"], cfg.norm_eps)
            qkv = jnp.matmul(hn, layer["wqkv"],
                             preferred_element_type=jnp.float32
                             ).astype(cfg.dtype)
            q = qkv[..., :H_l * D].reshape(B, S, H_l, D)
            k = qkv[..., H_l * D:H_l * D + kvd_l].reshape(B, S, Hkv_l, D)
            v = qkv[..., H_l * D + kvd_l:].reshape(B, S, Hkv_l, D)
            q = rope(q, pos, cfg.rope_theta)
            k = rope(k, pos, cfg.rope_theta)
            kh = jnp.swapaxes(k, 1, 2)
            vh = jnp.swapaxes(v, 1, 2)
            if kv_quant:
                kq, ks = quantize_kv_row(kh)
                vq, vs = quantize_kv_row(vh)
                ck = jax.lax.dynamic_update_slice(cache["k"][i], kq,
                                                  (0, 0, 0, 0))
                cv = jax.lax.dynamic_update_slice(cache["v"][i], vq,
                                                  (0, 0, 0, 0))
                new["k_scale"].append(jax.lax.dynamic_update_slice(
                    cache["k_scale"][i], ks.astype(jnp.float32), (0, 0, 0)))
                new["v_scale"].append(jax.lax.dynamic_update_slice(
                    cache["v_scale"][i], vs.astype(jnp.float32), (0, 0, 0)))
            else:
                ck = jax.lax.dynamic_update_slice(
                    cache["k"][i], kh.astype(cache["k"][i].dtype),
                    (0, 0, 0, 0))
                cv = jax.lax.dynamic_update_slice(
                    cache["v"][i], vh.astype(cache["v"][i].dtype),
                    (0, 0, 0, 0))
            new["k"].append(ck)
            new["v"].append(cv)
            kf = kh if rep == 1 else jnp.repeat(kh, rep, axis=1)
            vf = vh if rep == 1 else jnp.repeat(vh, rep, axis=1)
            att = jnp.swapaxes(
                flash_attention(jnp.swapaxes(q, 1, 2), kf, vf, causal=True),
                1, 2).reshape(B, S, H_l * D).astype(cfg.dtype)
            x = x + jax.lax.psum(
                jnp.matmul(att, layer["wo"],
                           preferred_element_type=jnp.float32
                           ).astype(cfg.dtype), tp_axis)
            h2 = rmsnorm(x, layer["mlp_norm"], cfg.norm_eps)
            gu = jnp.matmul(h2, layer["w_gateup"],
                            preferred_element_type=jnp.float32)
            inter_l = cfg.intermediate // tp
            act = (jax.nn.silu(gu[..., :inter_l]) * gu[..., inter_l:]
                   ).astype(cfg.dtype)
            x = x + jax.lax.psum(
                jnp.matmul(act, layer["w_down"],
                           preferred_element_type=jnp.float32
                           ).astype(cfg.dtype), tp_axis)
        xf = rmsnorm(x[:, -1:], params["final_norm"], cfg.norm_eps)
        logits_l = jnp.matmul(xf.reshape(B, dim), params["lm_head"],
                              preferred_element_type=jnp.float32)
        logits = jax.lax.all_gather(logits_l, tp_axis, axis=1, tiled=True)
        return logits, new

    def float_specs():
        stacked = P(tp_axis, None, None)
        return {
            "embed": P(), "final_norm": P(), "lm_head": stacked,
            "layers": [{"attn_norm": P(), "mlp_norm": P(),
                        "wqkv": stacked, "wo": stacked,
                        "w_gateup": stacked, "w_down": stacked}
                       for _ in range(cfg.n_layers)],
        }

    def step(params, tokens, cache):
        use_dp = (dp_axis and dp_axis in mesh.shape
                  and mesh.shape[dp_axis] > 1)
        b_spec = P(dp_axis) if use_dp else P()
        cache_spec = jax.tree_util.tree_map(
            lambda _: P(dp_axis if use_dp else None, tp_axis), cache)

        def strip(p):
            return jax.tree_util.tree_map(
                lambda v: v[0] if v.ndim >= 3 else v, p)

        fn = shard_map(
            lambda pr, t, c: local_prefill(strip(pr), t, c),
            mesh=mesh,
            in_specs=(float_specs(), b_spec, cache_spec),
            out_specs=(b_spec, cache_spec),
            check_rep=False)
        return fn(params, tokens, cache)

    return step


def init_tp_kv_cache(cfg: LlamaConfig, batch: int, tp: int,
                     max_seq: Optional[int] = None,
                     kv_quant: bool = True) -> dict:
    """GLOBAL-shape cache ([B, Hkv, S, D]); shard_map slices heads over
    tp and batch over dp."""
    from infinitensor_tpu.models.llama import init_kv_cache
    return init_kv_cache(cfg, batch, max_seq=max_seq, kv_quant=kv_quant)
