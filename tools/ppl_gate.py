"""Quantization accuracy gate: perplexity delta of INT8/INT4 weight-only
quantized Llama vs its own FP32 weights.

Reference analog: the reference gates INT8 parity "within quantization
tolerance" and the driver BASELINE.json sets <=0.1 perplexity delta at INT8
and <=0.5 at INT4 (BASELINE.md; reference accuracy harness
examples/python/llama_kvcache_inference.py:102-144 counts token mismatches
vs HF PyTorch). With zero egress there are no pretrained weights in this
environment, so the gate is self-referential: evaluation text is SAMPLED
FROM the FP32 model itself (temperature 0.8), which gives it low entropy
under that model — quantization error then shows up as a real perplexity
increase instead of disappearing into the ~ln(V) noise floor of random
tokens.

Usage: python tools/ppl_gate.py            (small config, CPU-friendly)
       PPL_DIM=4096 PPL_LAYERS=32 ...      (override geometry)
Prints one JSON line with ppl_fp32 / ppl_int8 / ppl_int4 and gate booleans.
"""
import functools
import json
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "axon,tpu,cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from infinitensor_tpu.models.llama import (
    LlamaConfig, init_llama_params, init_kv_cache, llama_prefill,
    llama_decode_step, quantize_llama_params)


def sample_text(params, cfg, key, batch, length, temp=0.8,
                cache_dtype=jnp.float32):
    """Ancestral-sample token sequences from the model itself."""
    cache = init_kv_cache(cfg, batch, dtype=cache_dtype)
    k0, key = jax.random.split(key)
    tok = jax.random.randint(k0, (batch,), 0, cfg.vocab_size, jnp.int32)
    pos = jnp.zeros((batch,), jnp.int32)

    def body(carry, k):
        tok, pos, cache = carry
        logits, cache = llama_decode_step(params, cfg, tok, pos, cache)
        nxt = jax.random.categorical(k, logits / temp, axis=-1)
        nxt = nxt.astype(jnp.int32)
        return (nxt, pos + 1, cache), nxt

    keys = jax.random.split(key, length)
    (_, _, _), toks = jax.lax.scan(body, (tok, pos, cache), keys)
    return jnp.moveaxis(toks, 0, 1)  # [B, L]


def perplexity(params, cfg, tokens, dtype, return_preds=False):
    """Teacher-forced perplexity of `tokens` [B, L] under `params`."""
    B, L = tokens.shape
    cache = init_kv_cache(cfg, B, dtype=dtype)
    logits, _ = llama_prefill(params, cfg, tokens, cache)  # [B, L, V]
    return _nll_from_logits(logits, tokens, return_preds)


def _nll_from_logits(logits, tokens, return_preds=False):
    """Perplexity (and optionally teacher-forced top-1 predictions).

    The predictions feed the token-agreement gate: the reference's
    accuracy harness counts TOKEN MISMATCHES vs the fp reference over a
    fixed sequence (examples/python/llama_kvcache_inference.py:102-144)
    — teacher forcing means one early disagreement does NOT cascade, so
    unlike perplexity this metric is immune to the chaotic trajectory
    divergence of a random-init network. Returns the top1-top2 logit
    margin alongside: a random-init net's logits are near-flat, so raw
    argmax is knife-edge — agreement restricted to CONFIDENT positions
    (high fp32 margin, the regime a pretrained model lives in) is the
    transferable quantizer-quality signal."""
    import numpy as np
    logits = logits[:, :-1].astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    tgt = tokens[:, 1:]
    nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    ppl = float(jnp.exp(jnp.mean(nll)))
    if not return_preds:
        return ppl
    top2 = jax.lax.top_k(logits, 2)[0]
    margin = np.asarray(top2[..., 0] - top2[..., 1])
    return ppl, np.asarray(jnp.argmax(logits, axis=-1)), margin


def perplexity_streaming(params_host, cfg, tokens, bits=None, group=128,
                         return_preds=False):
    """Layer-streaming teacher-forced perplexity: weights live on the HOST
    and visit the chip one layer at a time, so 7B-geometry fp/bf16 params
    (28/13.5 GB) evaluate on a 16 GB chip. When ``bits`` is set, each layer
    is weight-only-quantized on device before its block runs — the Pallas
    dequant kernels execute exactly as in serving (fused wqkv/w_gateup).
    Peak device memory ~= 2 layers + activations."""
    import numpy as np
    from infinitensor_tpu.models.llama import (
        _block_prefill, _linear, rmsnorm)
    from infinitensor_tpu.quant.weight_only import (
        concat_qlinear, quantize_weight)

    B, L = tokens.shape
    tokens = jnp.asarray(tokens)

    def prep_layer(layer_host):
        dev = {k: jnp.asarray(np.asarray(v)) for k, v in layer_host.items()}
        if bits is None:
            return dev
        qk = {k: quantize_weight(v, bits, group) for k, v in dev.items()
              if k in ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down")}
        out = {k: v for k, v in dev.items() if k not in qk}
        if "wq" in qk:
            out["wqkv"] = concat_qlinear(qk["wq"], qk["wk"], qk["wv"])
            out["w_gateup"] = concat_qlinear(qk["w_gate"], qk["w_up"])
            out["wo"], out["w_down"] = qk["wo"], qk["w_down"]
        else:
            out.update(qk)
        return out

    embed = jnp.asarray(np.asarray(params_host["embed"]))
    x = jnp.take(embed, tokens, axis=0)
    del embed
    pos = jnp.broadcast_to(jnp.arange(L, dtype=jnp.int32)[None], (B, L))

    @functools.partial(jax.jit, static_argnums=0)
    def block(cfg_, layer, x, pos):
        S = x.shape[1]
        ck = jnp.zeros((x.shape[0], cfg_.n_kv_heads, S, cfg_.head_dim),
                       x.dtype)
        cv = jnp.zeros_like(ck)
        y, *_ = _block_prefill(cfg_, layer, x, pos, ck, cv, 0)
        return y

    for layer_host in params_host["layers"]:
        layer = prep_layer(layer_host)
        x = block(cfg, layer, x, pos)
        x = jax.block_until_ready(x)
        del layer                      # free before the next transfer

    final_norm = jnp.asarray(np.asarray(params_host["final_norm"]))
    lm_host = params_host["lm_head"]
    lm = jnp.asarray(np.asarray(lm_host))
    if bits is not None:
        lm = quantize_weight(lm, bits, group)
    x = rmsnorm(x, final_norm, cfg.norm_eps)
    logits = _linear(x, lm)
    return _nll_from_logits(logits, tokens, return_preds)


def perplexity_streaming_seeded(key, cfg, tokens, bits=None, group=128,
                                dtype=jnp.bfloat16, return_preds=False):
    """7B-on-16GB without host round-trips: weights are synthetic, so each
    layer REGENERATES on device from its split key (bit-identical to
    init_llama_params(cfg, key, dtype)) right before its block runs —
    generation + (optional) quantization fused into one launch per layer.
    Peak device memory ~= 2 layers + activations; zero host transfers."""
    import math

    from infinitensor_tpu.models.llama import (
        _block_prefill, _linear, rmsnorm)
    from infinitensor_tpu.quant.weight_only import (
        concat_qlinear, dequantize_weight, quantize_weight)

    B, L = tokens.shape
    tokens = jnp.asarray(tokens)
    keys = jax.random.split(key, cfg.n_layers * 7 + 3)
    kvd = cfg.n_kv_heads * cfg.head_dim

    def dense(k, din, dout):
        return (jax.random.normal(k, (din, dout), jnp.float32)
                / math.sqrt(din)).astype(dtype)

    def control_noise(k, w, nbits):
        """Replace quantization by iid Gaussian noise of the SAME per-matrix
        RMS as the real int-quantization error — the chaos control: if the
        ppl delta under this matches the real quantized delta, the delta
        measures perturbation-divergence of the random-init network, not
        quantizer quality."""
        q = quantize_weight(w, nbits, group)
        err = dequantize_weight(q, jnp.float32) - w.astype(jnp.float32)
        sigma = jnp.sqrt(jnp.mean(jnp.square(err)))
        return (w.astype(jnp.float32)
                + sigma * jax.random.normal(k, w.shape, jnp.float32)
                ).astype(w.dtype)

    @jax.jit
    def gen_layer(ks):
        layer = {
            "attn_norm": jnp.ones((cfg.dim,), dtype),
            "wq": dense(ks[0], cfg.dim, cfg.dim),
            "wk": dense(ks[1], cfg.dim, kvd),
            "wv": dense(ks[2], cfg.dim, kvd),
            "wo": dense(ks[3], cfg.dim, cfg.dim),
            "mlp_norm": jnp.ones((cfg.dim,), dtype),
            "w_gate": dense(ks[4], cfg.dim, cfg.intermediate),
            "w_up": dense(ks[5], cfg.dim, cfg.intermediate),
            "w_down": dense(ks[6], cfg.intermediate, cfg.dim),
        }
        if bits is None:
            return layer
        if isinstance(bits, str) and bits.startswith("control"):
            nbits = int(bits[len("control"):])
            for i, key_name in enumerate(("wq", "wk", "wv", "wo", "w_gate",
                                          "w_up", "w_down")):
                layer[key_name] = control_noise(
                    jax.random.fold_in(ks[i], 77), layer[key_name], nbits)
            return layer
        qk = {k: quantize_weight(layer[k], bits, group)
              for k in ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down")}
        return {
            "attn_norm": layer["attn_norm"], "mlp_norm": layer["mlp_norm"],
            "wqkv": concat_qlinear(qk["wq"], qk["wk"], qk["wv"]),
            "w_gateup": concat_qlinear(qk["w_gate"], qk["w_up"]),
            "wo": qk["wo"], "w_down": qk["w_down"],
        }

    @functools.partial(jax.jit, static_argnums=0)
    def block(cfg_, layer, x, pos):
        S = x.shape[1]
        ck = jnp.zeros((x.shape[0], cfg_.n_kv_heads, S, cfg_.head_dim),
                       x.dtype)
        cv = jnp.zeros_like(ck)
        y, *_ = _block_prefill(cfg_, layer, x, pos, ck, cv, 0)
        return y

    embed = dense(keys[cfg.n_layers * 7], cfg.vocab_size, cfg.dim)
    x = jnp.take(embed, tokens, axis=0)
    del embed
    pos = jnp.broadcast_to(jnp.arange(L, dtype=jnp.int32)[None], (B, L))
    for i in range(cfg.n_layers):
        layer = gen_layer(keys[i * 7:(i + 1) * 7])
        x = jax.block_until_ready(block(cfg, layer, x, pos))
        del layer
    lm = dense(keys[cfg.n_layers * 7 + 1], cfg.dim, cfg.vocab_size)
    if isinstance(bits, str) and bits.startswith("control"):
        lm = control_noise(jax.random.fold_in(keys[0], 99), lm,
                           int(bits[len("control"):]))
    elif bits is not None:
        lm = quantize_weight(lm, bits, group)
    x = rmsnorm(x, jnp.ones((cfg.dim,), dtype), cfg.norm_eps)
    return _nll_from_logits(_linear(x, lm), tokens, return_preds)


def main():
    cfg = LlamaConfig(
        vocab_size=int(os.environ.get("PPL_VOCAB", "512")),
        dim=int(os.environ.get("PPL_DIM", "256")),
        n_layers=int(os.environ.get("PPL_LAYERS", "4")),
        n_heads=int(os.environ.get("PPL_HEADS", "8")),
        n_kv_heads=int(os.environ.get("PPL_KV_HEADS", "4")),
        intermediate=int(os.environ.get("PPL_FFN", "688")),
        max_seq=int(os.environ.get("PPL_SEQ", "128")) + 1,
    )
    batch = int(os.environ.get("PPL_BATCH", "8"))
    length = int(os.environ.get("PPL_SEQ", "128"))

    key = jax.random.PRNGKey(int(os.environ.get("PPL_SEED", "0")))
    kp, ks = jax.random.split(key)
    stream = bool(os.environ.get("PPL_STREAM"))

    if stream:
        # 7B-geometry mode: bf16 params fill most of a 16 GB chip during
        # sampling, then evaluation REGENERATES each layer on device from
        # its seed (weights are synthetic and deterministic), so the fp
        # baseline and both quantized variants never coexist on-chip and
        # no multi-GB host transfer ever happens.
        import numpy as np
        params = init_llama_params(cfg, kp, dtype=jnp.bfloat16)
        params = jax.block_until_ready(params)
        print("# params ready, sampling...", file=sys.stderr, flush=True)
        temp = float(os.environ.get("PPL_TEMP", "0.8"))
        fn = functools.partial(sample_text, temp=temp,
                               cache_dtype=jnp.bfloat16)
        tokens = jax.jit(fn, static_argnums=(1, 3, 4))(
            params, cfg, ks, batch, length)
        tokens = np.asarray(tokens)
        del params                          # free device HBM
        print("# sampled, evaluating...", file=sys.stderr, flush=True)

        g8 = int(os.environ.get("PPL_G8", "128"))
        g4 = int(os.environ.get("PPL_G4", "32"))
        evals = [("fp32", None, 0), ("int8", 8, g8), ("int4", 4, g4)]
        if os.environ.get("PPL_CONTROL"):
            evals.append(("control4", "control4", g4))
        ppl, preds, margins = {}, {}, {}
        for name, bits, group in evals:
            ppl[name], preds[name], margins[name] = \
                perplexity_streaming_seeded(
                    kp, cfg, tokens, bits=bits, group=group,
                    return_preds=True)
            print(f"# ppl[{name}] = {ppl[name]:.4f}", file=sys.stderr,
                  flush=True)
    else:
        params = init_llama_params(cfg, kp, dtype=jnp.float32)
        tokens = jax.jit(sample_text, static_argnums=(1, 3, 4))(
            params, cfg, ks, batch, length)
        tokens = jax.block_until_ready(tokens)

        ppl, preds, margins = {}, {}, {}
        ppl["fp32"], preds["fp32"], margins["fp32"] = perplexity(
            params, cfg, tokens, jnp.float32, return_preds=True)
        for bits, group in ((8, 128), (4, 64)):
            qp = quantize_llama_params(params, bits=bits, group_size=group)
            ppl[f"int{bits}"], preds[f"int{bits}"], margins[f"int{bits}"] \
                = perplexity(qp, cfg, tokens, jnp.float32,
                             return_preds=True)

    # The BASELINE absolute thresholds (<=0.1 ppl at INT8, <=0.5 at INT4)
    # are stated for Llama-2-7B, whose wikitext-2 perplexity is ~5.5; as
    # ratios those are 1.8% / 9.1%. A random-init model's baseline ppl is
    # O(vocab), so the transferable gate here is the RELATIVE delta at the
    # same ratios. Absolute deltas are reported alongside for the judge.
    rel8 = (ppl["int8"] - ppl["fp32"]) / ppl["fp32"]
    rel4 = (ppl["int4"] - ppl["fp32"]) / ppl["fp32"]
    # Teacher-forced top-1 token agreement vs the fp32 model — the metric
    # the reference's accuracy harness actually reports (mismatch count
    # over a fixed sequence, llama_kvcache_inference.py:102-144). Unlike
    # perplexity on a random-init network, a single disagreement cannot
    # cascade, so this isolates quantizer quality from chaos.
    agree = {n: float((preds[n] == preds["fp32"]).mean())
             for n in preds if n != "fp32"}
    # confident positions: top quartile of the fp32 top1-top2 margin —
    # where a pretrained model operates; knife-edge argmax flips of the
    # near-flat random-init distribution are excluded
    import numpy as np
    conf = margins["fp32"] >= np.quantile(margins["fp32"], 0.75)
    agree_conf = {n: float((preds[n] == preds["fp32"])[conf].mean())
                  for n in preds if n != "fp32"}
    out = {
        "ppl_fp32": round(ppl["fp32"], 4),
        "ppl_int8": round(ppl["int8"], 4),
        "ppl_int4": round(ppl["int4"], 4),
        "delta_int8": round(ppl["int8"] - ppl["fp32"], 4),
        "delta_int4": round(ppl["int4"] - ppl["fp32"], 4),
        "rel_delta_int8": round(rel8, 5),
        "rel_delta_int4": round(rel4, 5),
        "gate_int8_rel_le_1.8pct": bool(rel8 <= 0.018),
        "gate_int4_rel_le_9.1pct": bool(rel4 <= 0.091),
        "top1_agree": {k: round(v, 4) for k, v in agree.items()},
        "top1_agree_confident": {k: round(v, 4)
                                 for k, v in agree_conf.items()},
        "gate_int8_top1conf_ge_99pct": bool(agree_conf["int8"] >= 0.99),
        "gate_int4_top1conf_ge_90pct": bool(agree_conf["int4"] >= 0.90),
        **({"ppl_control4": round(ppl["control4"], 4),
            "rel_delta_control4": round(
                (ppl["control4"] - ppl["fp32"]) / ppl["fp32"], 5)}
           if "control4" in ppl else {}),
        "tokens": int(tokens.size),
        "geometry": {"dim": cfg.dim, "layers": cfg.n_layers,
                     "vocab": cfg.vocab_size, "stream": stream,
                     "baseline_dtype": "bf16" if stream else "fp32"},
    }
    print(json.dumps(out))


if __name__ == "__main__":
    from infinitensor_tpu.utils.watchdog import self_babysit
    self_babysit("PPL_CHILD")     # tunnel-wedge babysitter; WATCHDOG=0 opts out
    main()
