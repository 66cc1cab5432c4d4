"""Tensor-parallel shardings for the Llama family.

Megatron-style TP emitted as PartitionSpecs over a ("dp", "tp") mesh — the
TPU-native replacement for the reference's per-rank ONNX graph surgery
(reference examples/distributed/parallel_opt.py:9-247, which slices weights
column-then-row and inserts AllReduce nodes). Here the *same* placement
decisions are expressed declaratively and GSPMD inserts the collectives:

  wq/wk/wv, w_gate/w_up : Shard(out)  (column parallel — per-head split)
  wo, w_down            : Shard(in)   (row parallel -> psum after, via GSPMD)
  embed                 : Shard(dim)  (hidden sharded gather)
  lm_head               : Shard(out)  (vocab sharded logits)
  KV cache              : Shard(heads) + Shard(batch -> dp)
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from infinitensor_tpu.quant.weight_only import QuantizedLinear


def _linear_spec(col_parallel: bool):
    # [in, out]: column-parallel shards out, row-parallel shards in
    return P(None, "tp") if col_parallel else P("tp", None)


_COL_KEYS = {"wq", "wk", "wv", "w_gate", "w_up", "wqkv", "w_gateup"}
_ROW_KEYS = {"wo", "w_down"}


def _layer_specs(layer=None) -> dict:
    keys = layer.keys() if layer is not None else (
        "attn_norm", "wq", "wk", "wv", "wo", "mlp_norm", "w_gate", "w_up",
        "w_down")
    out = {}
    for k in keys:
        if k in _COL_KEYS:
            out[k] = _linear_spec(True)
        elif k in _ROW_KEYS:
            out[k] = _linear_spec(False)
        else:
            out[k] = P()
    return out


def llama_param_specs(cfg, params=None) -> dict:
    layers = params["layers"] if params is not None else [None] * cfg.n_layers
    return {
        "embed": P(None, "tp"),
        "final_norm": P(),
        "lm_head": P(None, "tp"),
        "layers": [_layer_specs(l) for l in layers],
    }


def llama_cache_specs(cfg) -> dict:
    # per-layer [B, Hkv, S, D]: batch over dp, kv heads over tp
    spec = P("dp", "tp", None, None)
    return {"k": [spec] * cfg.n_layers, "v": [spec] * cfg.n_layers}


def _spec_for_value(value, spec):
    """Adapt a weight PartitionSpec to QuantizedLinear leaves: qweight
    follows the weight spec; scales [ng, out] shard only the out dim."""
    if isinstance(value, QuantizedLinear):
        qspec = spec
        out_axis = spec[1] if len(spec) > 1 else None
        return QuantizedLinear(qspec, P(None, out_axis),  # type: ignore
                               value.bits, value.group_size)
    return spec


def tree_specs(params, specs):
    """Expand weight specs over QuantizedLinear leaves."""
    def go(p, s):
        if isinstance(p, QuantizedLinear):
            return _spec_for_value(p, s)
        if isinstance(p, dict):
            return {k: go(p[k], s[k]) for k in p}
        if isinstance(p, list):
            return [go(a, b) for a, b in zip(p, s)]
        return s
    return go(params, specs)


def shard_llama(params, cache, cfg, mesh: Mesh):
    """Place params + cache on the mesh with TP/DP shardings."""
    pspecs = tree_specs(params, llama_param_specs(cfg, params))
    cspecs = llama_cache_specs(cfg)

    def put(tree, specs):
        return jax.tree_util.tree_map(
            lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
            tree, specs,
            is_leaf=lambda x: isinstance(x, QuantizedLinear) and False)

    # flatten QuantizedLinear through the pytree protocol: device_put maps
    # over leaves (qweight/scales) with matching leaf specs from tree_specs.
    flat_p, treedef = jax.tree_util.tree_flatten(params)
    flat_s, _ = jax.tree_util.tree_flatten(
        pspecs, is_leaf=lambda x: isinstance(x, P))
    placed = [jax.device_put(x, NamedSharding(mesh, s))
              for x, s in zip(flat_p, flat_s)]
    params = jax.tree_util.tree_unflatten(treedef, placed)
    cache = {k: [jax.device_put(buf, NamedSharding(mesh, s_))
                 for buf, s_ in zip(v, cspecs[k])]
             for k, v in cache.items()}
    return params, cache


def io_shardings(cfg, mesh: Mesh):
    """(token, pos) input and logits output shardings for the decode step."""
    tok = NamedSharding(mesh, P("dp"))
    logits = NamedSharding(mesh, P("dp", "tp"))
    return tok, logits
