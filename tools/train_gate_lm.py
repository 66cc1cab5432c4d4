"""Decide the INT4/INT8 accuracy gates with a TRAINED instrument.

Round-2 finding (docs/ACCURACY_GATES.md): on a random-init network ANY
perturbation of INT4's RMS produces the same ppl delta — the instrument
has no margins, so the gate was uncertifiable. Fix (round-2 verdict item
6): train a small LM on-chip on procedural text until it has real margins,
then run the ppl + confident-agreement gate on it, with a matched-RMS
noise control and a second model size for scaling.

Data: an order-2 Markov language (each (t-2, t-1) context has a 0.95/0.05
split over two successors, tables drawn once from a fixed seed) — entropy
floor H = 0.199 nats/token (ppl 1.22), attention required to read the
order-2 context. Generated on-device inside the training step (zero
egress, zero host feed).

Training: plain jnp causal-attention forward (differentiable everywhere),
AdamW via optax, the whole run fused into lax.scan chunks (one executable
launch per LOG_EVERY steps — the tunnel's ~25 ms launch latency never
dominates). Weights land in the models/llama.py param layout, so the EVAL
runs through the real inference stack: llama_prefill fp32 vs
quantize_llama_params INT8/INT4 (the production quant path) vs fp32 +
matched-RMS Gaussian noise.

Gate (BASELINE.md): INT8 within 0.1 ppl of fp32; INT4 within 0.5.
Writes docs/PPL_GATE_TRAINED.json.
"""

import functools
import json
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "axon,tpu,cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
print = functools.partial(print, flush=True)

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "docs", "PPL_GATE_TRAINED.json")


def build_tables(vocab: int, seed: int):
    """Order-2 transition tables: succ[a, b] -> (main, alt) successors."""
    import numpy as np
    rng = np.random.default_rng(seed)
    main = rng.integers(0, vocab, (vocab, vocab), dtype=np.int32)
    alt = rng.integers(0, vocab, (vocab, vocab), dtype=np.int32)
    return main, alt


def make_sampler(main, alt, vocab, seq, p_main=0.95):
    """jit-able batch sampler: [B, seq] int32 sequences of the language."""
    import jax
    import jax.numpy as jnp

    main = jnp.asarray(main)
    alt = jnp.asarray(alt)

    def sample(key, batch):
        k0, k1, k2 = jax.random.split(key, 3)
        t0 = jax.random.randint(k0, (batch,), 0, vocab, jnp.int32)
        t1 = jax.random.randint(k1, (batch,), 0, vocab, jnp.int32)
        keys = jax.random.split(k2, seq)

        def step(carry, k):
            a, b = carry
            use_main = jax.random.bernoulli(k, p_main, (batch,))
            nxt = jnp.where(use_main, main[a, b], alt[a, b])
            return (b, nxt), nxt

        _, toks = jax.lax.scan(step, (t0, t1), keys)
        return jnp.moveaxis(toks, 0, 1)          # [B, seq]

    return sample


def train_forward(params, cfg, tokens):
    """Differentiable causal forward (jnp attention; same math as
    models/llama.py llama_prefill minus the cache/kernels)."""
    import jax
    import jax.numpy as jnp
    from infinitensor_tpu.models.llama import rmsnorm, rope

    B, S = tokens.shape
    x = jnp.take(params["embed"], tokens, axis=0)
    pos = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32)[None], (B, S))
    mask = jnp.tril(jnp.ones((S, S), bool))
    H, D = cfg.n_heads, cfg.head_dim
    for layer in params["layers"]:
        h = rmsnorm(x, layer["attn_norm"], cfg.norm_eps)
        q = (h @ layer["wq"]).reshape(B, S, H, D)
        k = (h @ layer["wk"]).reshape(B, S, H, D)
        v = (h @ layer["wv"]).reshape(B, S, H, D)
        q = rope(q, pos, cfg.rope_theta)
        k = rope(k, pos, cfg.rope_theta)
        s = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32),
                       k.astype(jnp.float32)) / (D ** 0.5)
        s = jnp.where(mask[None, None], s, -1e30)
        p = jax.nn.softmax(s, axis=-1)
        o = jnp.einsum("bhqk,bkhd->bqhd", p, v.astype(jnp.float32))
        x = x + o.reshape(B, S, cfg.dim).astype(x.dtype) @ layer["wo"]
        h2 = rmsnorm(x, layer["mlp_norm"], cfg.norm_eps)
        g = h2 @ layer["w_gate"]
        x = x + (jax.nn.silu(g.astype(jnp.float32)).astype(x.dtype)
                 * (h2 @ layer["w_up"])) @ layer["w_down"]
    x = rmsnorm(x, params["final_norm"], cfg.norm_eps)
    return x @ params["lm_head"]


def nll(params, cfg, tokens, forward):
    import jax
    import jax.numpy as jnp

    logits = forward(params, cfg, tokens).astype(jnp.float32)
    logp = jax.nn.log_softmax(logits[:, :-1], axis=-1)
    tgt = tokens[:, 1:]
    ll = jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    return -jnp.mean(ll)


def train(cfg, sampler, n_steps, batch, lr, log_every, key):
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax
    from infinitensor_tpu.models.llama import init_llama_params

    params = init_llama_params(cfg, key, dtype=jnp.float32)
    sched = optax.cosine_decay_schedule(lr, n_steps, alpha=0.1)
    opt = optax.adamw(sched, weight_decay=0.01)
    opt_state = opt.init(params)

    def one_step(carry, k):
        params, opt_state = carry
        toks = sampler(k, batch)
        loss, grads = jax.value_and_grad(
            lambda p: nll(p, cfg, toks, train_forward))(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), loss

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def chunk(params, opt_state, keys):
        (params, opt_state), losses = jax.lax.scan(
            one_step, (params, opt_state), keys)
        return params, opt_state, losses

    kiter = jax.random.split(jax.random.PRNGKey(1234),
                             (n_steps // log_every, log_every))
    t0 = time.time()
    for i, keys in enumerate(kiter):
        params, opt_state, losses = chunk(params, opt_state, keys)
        last = float(np.asarray(losses[-1]))   # host fetch = honest sync
        print(f"# step {(i + 1) * log_every}/{n_steps} "
              f"loss {last:.4f} ({time.time() - t0:.0f}s)")
    return params


def eval_ppl(params, cfg, eval_toks):
    """Ppl through the REAL inference stack (llama_prefill)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from infinitensor_tpu.models.llama import init_kv_cache, llama_prefill

    def fw(p, c, toks):
        cache = init_kv_cache(c, toks.shape[0], max_seq=toks.shape[1],
                              dtype=jnp.float32)
        logits, _ = llama_prefill(p, c, toks, cache)
        return logits

    v = float(np.asarray(jax.jit(
        lambda p, t: nll(p, cfg, t, lambda pp, cc, tt: fw(pp, cc, tt)))(
            params, eval_toks)))
    return float(np.exp(v)), v


def noise_like_int4(params, cfg, key):
    """fp32 weights + Gaussian noise whose per-matrix RMS matches the
    INT4 round-trip error (the matched-noise control)."""
    import jax
    import jax.numpy as jnp
    from infinitensor_tpu.models.llama import (
        _QUANT_KEYS, quantize_llama_params)
    from infinitensor_tpu.quant.weight_only import dequantize_weight

    q4 = quantize_llama_params(params, bits=4, group_size=128, fuse=False)
    out = {"embed": params["embed"], "final_norm": params["final_norm"],
           "layers": []}
    keys = iter(jax.random.split(key, len(params["layers"]) * 7 + 1))

    def noisy(w, ql):
        err = dequantize_weight(ql, dtype=jnp.float32) - w
        rms = jnp.sqrt(jnp.mean(jnp.square(err)))
        return w + rms * jax.random.normal(next(keys), w.shape, jnp.float32)

    out["lm_head"] = noisy(params["lm_head"], q4["lm_head"])
    for layer, ql in zip(params["layers"], q4["layers"]):
        nl = {k: v for k, v in layer.items() if k not in _QUANT_KEYS}
        for k in _QUANT_KEYS:
            nl[k] = noisy(layer[k], ql[k])
        out["layers"].append(nl)
    return out


def confident_agreement(params_a, params_b, cfg, toks, thresh=0.9):
    """Top-1 agreement on positions where model A is confident."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from infinitensor_tpu.models.llama import init_kv_cache, llama_prefill

    def logits_of(p):
        cache = init_kv_cache(cfg, toks.shape[0], max_seq=toks.shape[1],
                              dtype=jnp.float32)
        lg, _ = jax.jit(llama_prefill, static_argnums=1)(p, cfg, toks,
                                                         cache)
        return lg

    la, lb = logits_of(params_a), logits_of(params_b)
    pa = jax.nn.softmax(la.astype(jnp.float32), axis=-1)
    conf = jnp.max(pa, axis=-1) >= thresh
    agree = jnp.argmax(la, axis=-1) == jnp.argmax(lb, axis=-1)
    n_conf = float(np.asarray(jnp.sum(conf)))
    if n_conf == 0:
        return 0.0, 0
    return (float(np.asarray(jnp.sum(agree & conf))) / n_conf,
            int(n_conf))


def run_size(tag, cfg, n_steps, batch, results):
    import jax
    from infinitensor_tpu.models.llama import quantize_llama_params

    vocab, seq = cfg.vocab_size, cfg.max_seq
    main, alt = build_tables(vocab, seed=7)
    sampler = make_sampler(main, alt, vocab, seq)
    t0 = time.time()
    params = train(cfg, sampler, n_steps=n_steps, batch=batch, lr=1e-3,
                   log_every=max(25, n_steps // 20),
                   key=jax.random.PRNGKey(5))
    train_s = time.time() - t0
    eval_toks = sampler(jax.random.PRNGKey(99), 64)

    ppl32, _ = eval_ppl(params, cfg, eval_toks)
    p8 = quantize_llama_params(params, bits=8, group_size=128, fuse=False)
    p4 = quantize_llama_params(params, bits=4, group_size=128, fuse=False)
    pn = noise_like_int4(params, cfg, jax.random.PRNGKey(11))
    ppl8, _ = eval_ppl(p8, cfg, eval_toks)
    ppl4, _ = eval_ppl(p4, cfg, eval_toks)
    ppln, _ = eval_ppl(pn, cfg, eval_toks)
    agree8, n8 = confident_agreement(params, p8, cfg, eval_toks[:16])
    agree4, n4 = confident_agreement(params, p4, cfg, eval_toks[:16])
    agreen, _ = confident_agreement(params, pn, cfg, eval_toks[:16])

    entry = {
        "config": {"dim": cfg.dim, "n_layers": cfg.n_layers,
                   "vocab": vocab, "seq": seq, "steps": n_steps,
                   "batch": batch,
                   "params_m": round(sum(
                       x.size for x in jax.tree_util.tree_leaves(params))
                       / 1e6, 1)},
        "train_s": round(train_s, 1),
        "entropy_floor_ppl": 1.22,
        "ppl_fp32": round(ppl32, 4),
        "ppl_int8": round(ppl8, 4),
        "ppl_int4": round(ppl4, 4),
        "ppl_fp32_plus_int4rms_noise": round(ppln, 4),
        "delta_int8": round(ppl8 - ppl32, 4),
        "delta_int4": round(ppl4 - ppl32, 4),
        "delta_noise_control": round(ppln - ppl32, 4),
        "confident_top1_agreement": {
            "int8": round(agree8, 4), "int4": round(agree4, 4),
            "noise_control": round(agreen, 4), "n_confident": n8,
        },
        "gate_int8_le_0p1": bool(ppl8 - ppl32 <= 0.1),
        "gate_int4_le_0p5": bool(ppl4 - ppl32 <= 0.5),
    }
    results["sizes"][tag] = entry
    print(f"# {tag}: {json.dumps(entry)}")
    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from infinitensor_tpu.models.llama import LlamaConfig

    np.asarray(jnp.zeros((1,)))
    print(f"# device ready: {jax.devices()[0]}")
    results = {"protocol": "trained order-2 Markov LM (p_main=0.95), "
               "eval through llama_prefill fp32 vs production "
               "quantize_llama_params, matched-RMS noise control; "
               "gates from BASELINE.md", "sizes": {}}
    small = os.environ.get("GATE_SMALL")
    cfg_a = LlamaConfig(vocab_size=256, dim=256, n_layers=4, n_heads=4,
                        n_kv_heads=4, intermediate=704, max_seq=128,
                        dtype=jnp.float32)
    run_size("4m", cfg_a, n_steps=100 if small else 1500,
             batch=8 if small else 32, results=results)
    if not small:
        cfg_b = LlamaConfig(vocab_size=512, dim=512, n_layers=8, n_heads=8,
                            n_kv_heads=8, intermediate=1376, max_seq=256,
                            dtype=jnp.float32)
        run_size("26m", cfg_b, n_steps=2000, batch=32, results=results)
    verdict = all(e["gate_int8_le_0p1"] and e["gate_int4_le_0p5"]
                  for e in results["sizes"].values())
    results["verdict"] = ("PASS" if verdict else "FAIL")
    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps({"metric": "trained ppl gate", "pass": verdict}))


if __name__ == "__main__":
    from infinitensor_tpu.utils.watchdog import self_babysit
    self_babysit("GATE_CHILD")
    main()


def eval_ppl_decode(params, cfg, eval_toks, kv_quant=True):
    """Teacher-forced ppl through the FUSED MULTI-STEP DECODE LOOP — the
    flagship serving path (bench.py): a lax.scan of llama_decode_step with
    the INT8-KV cache, so on TPU the logits come from flash_decode_q8 +
    the Pallas quant matmuls, not the prefill stack. Gate v3 certifies the
    SHIPPED path (round-4 verdict weak #4): KV8 write/read error and the
    decode kernels are inside the instrument."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from infinitensor_tpu.models.llama import (
        init_kv_cache, llama_decode_step)

    B, L = eval_toks.shape

    def fw(p, toks):
        cache = init_kv_cache(cfg, B, max_seq=L + 1, dtype=jnp.float32,
                              kv_quant=kv_quant)

        def body(carry, tok):
            pos, cache = carry
            logits, cache = llama_decode_step(p, cfg, tok, pos, cache)
            return (pos + 1, cache), logits

        toks_t = jnp.moveaxis(toks, 0, 1)           # [L, B]
        (_, _), logits = jax.lax.scan(
            body, (jnp.zeros((B,), jnp.int32), cache), toks_t)
        return jnp.moveaxis(logits, 0, 1)           # [B, L, V]

    v = float(np.asarray(jax.jit(
        lambda p, t: nll(p, cfg, t, lambda pp, cc, tt: fw(pp, tt)))(
            params, eval_toks)))
    return float(np.exp(v)), v
