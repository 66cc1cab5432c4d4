"""Checkpoint loaders: HuggingFace state dicts -> native param pytrees.

The reference consumes weights via ONNX initializers; real serving needs
checkpoint ingestion. These loaders map HF (torch) state_dicts for the
Llama / GPT-2 / BERT families onto the functional param layouts in
models/*.py (transposing torch's [out, in] linear layout to [in, out]).
Works from an in-memory state_dict or a directory of .safetensors /
torch .bin shards.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np
import jax.numpy as jnp


def _load_state_dict(path_or_sd):
    if not isinstance(path_or_sd, (str, os.PathLike)):
        return dict(path_or_sd)
    sd = {}
    path = str(path_or_sd)
    files = sorted(os.listdir(path))
    st_files = [f for f in files if f.endswith(".safetensors")]
    bin_files = [f for f in files if f.endswith(".bin")]
    if st_files:
        from safetensors import safe_open  # optional dep; gate at call time
        for f in st_files:
            with safe_open(os.path.join(path, f), framework="np") as fh:
                for k in fh.keys():
                    sd[k] = fh.get_tensor(k)
    elif bin_files:
        import torch
        for f in bin_files:
            part = torch.load(os.path.join(path, f), map_location="cpu",
                              weights_only=True)
            sd.update(part)
    else:
        raise FileNotFoundError(f"no checkpoint shards in {path}")
    return sd


def _t(sd, key, transpose=False, dtype=jnp.bfloat16):
    v = sd[key]
    if hasattr(v, "detach"):
        v = v.detach().to("cpu").float().numpy()
    arr = np.asarray(v, np.float32)
    if transpose:
        arr = arr.T
    return jnp.asarray(arr).astype(dtype)


def load_llama_params(path_or_sd, cfg, dtype=None, prefix: str = "model."
                      ) -> dict:
    """HF LlamaForCausalLM layout -> models/llama.py params."""
    sd = _load_state_dict(path_or_sd)
    dtype = dtype or cfg.dtype
    layers = []
    for i in range(cfg.n_layers):
        p = f"{prefix}layers.{i}."
        layers.append({
            "attn_norm": _t(sd, p + "input_layernorm.weight", dtype=dtype),
            "wq": _t(sd, p + "self_attn.q_proj.weight", True, dtype),
            "wk": _t(sd, p + "self_attn.k_proj.weight", True, dtype),
            "wv": _t(sd, p + "self_attn.v_proj.weight", True, dtype),
            "wo": _t(sd, p + "self_attn.o_proj.weight", True, dtype),
            "mlp_norm": _t(sd, p + "post_attention_layernorm.weight",
                           dtype=dtype),
            "w_gate": _t(sd, p + "mlp.gate_proj.weight", True, dtype),
            "w_up": _t(sd, p + "mlp.up_proj.weight", True, dtype),
            "w_down": _t(sd, p + "mlp.down_proj.weight", True, dtype),
        })
    embed = _t(sd, f"{prefix}embed_tokens.weight", dtype=dtype)
    lm_key = "lm_head.weight"
    lm = _t(sd, lm_key, True, dtype) if lm_key in sd else embed.T
    return {
        "embed": embed,
        "final_norm": _t(sd, f"{prefix}norm.weight", dtype=dtype),
        "lm_head": lm,
        "layers": layers,
    }


def load_gpt2_params(path_or_sd, cfg, dtype=None,
                     prefix: str = "transformer.") -> dict:
    """HF GPT2LMHeadModel layout (Conv1D = already [in, out])."""
    sd = _load_state_dict(path_or_sd)
    dtype = dtype or cfg.dtype
    layers = []
    for i in range(cfg.n_layers):
        p = f"{prefix}h.{i}."
        layers.append({
            "ln1_g": _t(sd, p + "ln_1.weight", dtype=dtype),
            "ln1_b": _t(sd, p + "ln_1.bias", dtype=dtype),
            "w_qkv": _t(sd, p + "attn.c_attn.weight", dtype=dtype),
            "b_qkv": _t(sd, p + "attn.c_attn.bias", dtype=dtype),
            "w_o": _t(sd, p + "attn.c_proj.weight", dtype=dtype),
            "b_o": _t(sd, p + "attn.c_proj.bias", dtype=dtype),
            "ln2_g": _t(sd, p + "ln_2.weight", dtype=dtype),
            "ln2_b": _t(sd, p + "ln_2.bias", dtype=dtype),
            "w_up": _t(sd, p + "mlp.c_fc.weight", dtype=dtype),
            "b_up": _t(sd, p + "mlp.c_fc.bias", dtype=dtype),
            "w_down": _t(sd, p + "mlp.c_proj.weight", dtype=dtype),
            "b_down": _t(sd, p + "mlp.c_proj.bias", dtype=dtype),
        })
    return {
        "wte": _t(sd, f"{prefix}wte.weight", dtype=dtype),
        "wpe": _t(sd, f"{prefix}wpe.weight", dtype=dtype),
        "lnf_g": _t(sd, f"{prefix}ln_f.weight", dtype=dtype),
        "lnf_b": _t(sd, f"{prefix}ln_f.bias", dtype=dtype),
        "layers": layers,
    }


def load_bert_params(path_or_sd, cfg, dtype=jnp.float32,
                     prefix: str = "") -> dict:
    sd = _load_state_dict(path_or_sd)
    layers = []
    for i in range(cfg.n_layers):
        p = f"{prefix}encoder.layer.{i}."
        layers.append({
            "wq": _t(sd, p + "attention.self.query.weight", True, dtype),
            "bq": _t(sd, p + "attention.self.query.bias", dtype=dtype),
            "wk": _t(sd, p + "attention.self.key.weight", True, dtype),
            "bk": _t(sd, p + "attention.self.key.bias", dtype=dtype),
            "wv": _t(sd, p + "attention.self.value.weight", True, dtype),
            "bv": _t(sd, p + "attention.self.value.bias", dtype=dtype),
            "wo": _t(sd, p + "attention.output.dense.weight", True, dtype),
            "bo": _t(sd, p + "attention.output.dense.bias", dtype=dtype),
            "ln1_g": _t(sd, p + "attention.output.LayerNorm.weight",
                        dtype=dtype),
            "ln1_b": _t(sd, p + "attention.output.LayerNorm.bias",
                        dtype=dtype),
            "w_up": _t(sd, p + "intermediate.dense.weight", True, dtype),
            "b_up": _t(sd, p + "intermediate.dense.bias", dtype=dtype),
            "w_down": _t(sd, p + "output.dense.weight", True, dtype),
            "b_down": _t(sd, p + "output.dense.bias", dtype=dtype),
            "ln2_g": _t(sd, p + "output.LayerNorm.weight", dtype=dtype),
            "ln2_b": _t(sd, p + "output.LayerNorm.bias", dtype=dtype),
        })
    e = f"{prefix}embeddings."
    return {
        "tok": _t(sd, e + "word_embeddings.weight", dtype=dtype),
        "pos": _t(sd, e + "position_embeddings.weight", dtype=dtype),
        "type": _t(sd, e + "token_type_embeddings.weight", dtype=dtype),
        "emb_ln_g": _t(sd, e + "LayerNorm.weight", dtype=dtype),
        "emb_ln_b": _t(sd, e + "LayerNorm.bias", dtype=dtype),
        "layers": layers,
    }


def load_opt_params(path_or_sd, cfg, dtype=None,
                    prefix: str = "model.decoder.") -> dict:
    """HF OPTForCausalLM layout -> models/opt.py params (q/k/v fused)."""
    sd = _load_state_dict(path_or_sd)
    dtype = dtype or cfg.dtype
    layers = []
    for i in range(cfg.n_layers):
        p = f"{prefix}layers.{i}."
        w_qkv = jnp.concatenate(
            [_t(sd, p + f"self_attn.{n}_proj.weight", True, dtype)
             for n in ("q", "k", "v")], axis=1)
        b_qkv = jnp.concatenate(
            [_t(sd, p + f"self_attn.{n}_proj.bias", dtype=dtype)
             for n in ("q", "k", "v")])
        layers.append({
            "ln1_g": _t(sd, p + "self_attn_layer_norm.weight", dtype=dtype),
            "ln1_b": _t(sd, p + "self_attn_layer_norm.bias", dtype=dtype),
            "w_qkv": w_qkv,
            "b_qkv": b_qkv,
            "w_o": _t(sd, p + "self_attn.out_proj.weight", True, dtype),
            "b_o": _t(sd, p + "self_attn.out_proj.bias", dtype=dtype),
            "ln2_g": _t(sd, p + "final_layer_norm.weight", dtype=dtype),
            "ln2_b": _t(sd, p + "final_layer_norm.bias", dtype=dtype),
            "w_up": _t(sd, p + "fc1.weight", True, dtype),
            "b_up": _t(sd, p + "fc1.bias", dtype=dtype),
            "w_down": _t(sd, p + "fc2.weight", True, dtype),
            "b_down": _t(sd, p + "fc2.bias", dtype=dtype),
        })
    return {
        "wte": _t(sd, f"{prefix}embed_tokens.weight", dtype=dtype),
        "wpe": _t(sd, f"{prefix}embed_positions.weight", dtype=dtype),
        "lnf_g": _t(sd, f"{prefix}final_layer_norm.weight", dtype=dtype),
        "lnf_b": _t(sd, f"{prefix}final_layer_norm.bias", dtype=dtype),
        "layers": layers,
    }
