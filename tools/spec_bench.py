"""Speculative-decoding performance evidence (round-4 verdict item 4).

Three sections, each written to docs/SPEC_DECODE.json:

  mechanism   costs on the 7B INT4+KV8 flagship config (random weights —
              accept rates are model-dependent, the COSTS are not):
              t_verify(K) for K in {2,4,8} (pure device, chained
              two-point), the fused-decode per-step baseline, the
              tunnel launch RT, and the resulting break-even accept
              rates: spec wins iff
                 E[tok/launch](a, K) / (t_verify + RT)
                   > 1 / (t_step + RT/chunk)
              with E[tok/launch] = 1 + sum_{i<K} a^i (iid accept a).
  measured_7b speculative_generate (prompt-lookup) end-to-end on the 7B
              at K in {2,4,8}: tok/s + accept rate. Random weights make
              the accept rate an honest lower bound, not a claim.
  trained_lm  the same production path on the on-chip-trained order-2
              Markov LM (tools/train_gate_lm.py instrument, p_main=0.95)
              where n-gram lookup SHOULD accept: real accept rates with
              learned structure, prompt-lookup and small-model draft.

Reference discipline anchor: the reference ships flagship-path evidence
for every serving feature it has (examples/python/
llama_kvcache_inference.py:102-144); this closes the same loop for the
speculative path.

Run: python tools/spec_bench.py         (real TPU)
     SPEC_SMALL=1 for a CPU/interpret smoke of the harness itself.
"""

import functools
import json
import os
import sys
import threading
import time

os.environ.setdefault("JAX_PLATFORMS", "axon,tpu,cpu")
_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
print = functools.partial(print, flush=True)

OUT = os.path.join(_ROOT, "docs", "SPEC_DECODE.json")
RESULTS: dict = {"metric": "speculative decoding evidence"}


def emit(key, data):
    RESULTS[key] = data
    print(f"# {key}: {json.dumps(data)}")
    with open(OUT, "w") as f:
        json.dump(RESULTS, f, indent=1)


def _expected_tokens_per_launch(a: float, K: int) -> float:
    return 1.0 + sum(a ** i for i in range(1, K))


def _first_div(a, b) -> int:
    """Index of the first token where the spec stream diverges from the
    decode-path greedy stream (-1 = identical). Speculation emits the
    TARGET's own greedy choice at every position; a divergence marks an
    fp-path argmax tie between the K-token verify pass and the 1-token
    decode pass (near-uniform logits on random weights amplify it), and
    everything after the first flip differs autoregressively."""
    import numpy as np
    n = min(a.shape[1], b.shape[1])
    neq = np.asarray(a)[:, :n] != np.asarray(b)[:, :n]
    if not neq.any():
        return -1
    return int(neq.any(axis=0).argmax())


def measure_launch_rt_ms(n: int = 7) -> float:
    import jax
    import jax.numpy as jnp
    import numpy as np

    f = jax.jit(lambda x: x + 1.0)
    np.asarray(f(jnp.float32(0.0)))
    best = float("inf")
    for i in range(n):
        t0 = time.perf_counter()
        np.asarray(f(jnp.float32(i)))
        best = min(best, time.perf_counter() - t0)
    return 1e3 * best


def chained_ms(build_fn, n_lo=1, n_hi=7, reps=3):
    """build_fn() -> (f, args) where f(n, *args) is jitted with a
    runtime trip count and returns a host-fetchable array. Returns
    per-trip ms."""
    import jax.numpy as jnp
    import numpy as np

    f, args = build_fn()
    np.asarray(f(jnp.int32(1), *args))      # compile

    def run_n(n):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(f(jnp.int32(n), *args))
            best = min(best, time.perf_counter() - t0)
        return best

    return 1e3 * (run_n(n_hi) - run_n(n_lo)) / (n_hi - n_lo)


def mechanism(params, cfg, cache_fn, chunk: int, Ks=(2, 4, 8)):
    """Device-side verify and decode costs + break-even accept table."""
    import jax
    import jax.numpy as jnp
    from infinitensor_tpu.models.llama import (
        llama_decode_step, llama_verify_step)

    B = 1
    launch_rt = measure_launch_rt_ms()
    emit("mechanism.launch_rt_ms", round(launch_rt, 2))

    # fused-decode baseline: per-step device time. params enter as a
    # JIT ARGUMENT — closure-captured multi-GB trees become HLO
    # constants and stall the remote compiler (round-4 lesson,
    # CLAUDE.md memory: jit-closure-constants)
    def build_decode():
        cache = cache_fn(B)
        tok = jnp.zeros((B,), jnp.int32)
        pos = jnp.full((B,), 64, jnp.int32)

        def f(n, p_, tok, pos, cache):
            def body(i, carry):
                t, p, c = carry
                logits, c = llama_decode_step(p_, cfg, t, p, c)
                nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                p = jnp.where(p >= cfg.max_seq - 2,
                              jnp.full_like(p, 64), p + 1)
                return (nxt, p, c)
            t, p, c = jax.lax.fori_loop(0, n, body, (tok, pos, cache))
            return t
        return jax.jit(f), (params, tok, pos, cache)

    t_step = chained_ms(build_decode, n_lo=2, n_hi=18)
    emit("mechanism.decode_step_device_ms", round(t_step, 3))

    rows = {}
    for K in Ks:
        def build_verify(K=K):
            cache = cache_fn(B)
            toks = jnp.zeros((B, K), jnp.int32)
            pos = jnp.full((B,), 64, jnp.int32)

            def f(n, p_, toks, pos, cache):
                def body(i, carry):
                    t, c = carry
                    logits, c = llama_verify_step(p_, cfg, t, pos, c)
                    nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                    return (nxt, c)
                t, c = jax.lax.fori_loop(0, n, body, (toks, cache))
                return t
            return jax.jit(f), (params, toks, pos, cache)

        t_verify = chained_ms(build_verify, n_lo=1, n_hi=9)
        base_tok_s = 1e3 / (t_step + launch_rt / max(chunk, 1))
        curve = {}
        for a in (0.3, 0.5, 0.7, 0.9, 1.0):
            e = _expected_tokens_per_launch(a, K)
            curve[str(a)] = round(1e3 * e / (t_verify + launch_rt), 1)
        # break-even accept: bisect a in [0,1]
        lo, hi = 0.0, 1.0
        for _ in range(40):
            mid = (lo + hi) / 2
            sp = 1e3 * _expected_tokens_per_launch(mid, K) \
                / (t_verify + launch_rt)
            if sp < base_tok_s:
                lo = mid
            else:
                hi = mid
        rows[f"K{K}"] = {
            "t_verify_device_ms": round(t_verify, 3),
            "spec_tok_s_at_accept": curve,
            "baseline_fused_tok_s": round(base_tok_s, 1),
            "break_even_accept": round(hi, 3) if hi < 0.9995 else None,
        }
        emit(f"mechanism.K{K}", rows[f"K{K}"])
    return rows


def run_spec(params, cfg, prompt, n_steps, K, draft=None, cache=None):
    """speculative_generate wall-clock + stats (end-to-end incl. host)."""
    import jax.numpy as jnp
    from infinitensor_tpu.serving.speculative import speculative_generate
    import numpy as np

    # warmup/compile pass
    toks, stats = speculative_generate(params, cfg, prompt,
                                       min(n_steps, 8), K=K, draft=draft,
                                       cache=None)
    t0 = time.perf_counter()
    toks, stats = speculative_generate(params, cfg, prompt, n_steps, K=K,
                                       draft=draft, cache=None)
    wall = time.perf_counter() - t0
    B = int(np.asarray(prompt).shape[0])
    return {
        "tok_s": round(B * n_steps / wall, 1),
        "accept_rate": round(stats["accept_rate"], 3),
        "tokens_per_launch": round(stats["tokens_per_launch"], 2),
        "verify_launches": stats["verify_launches"],
        "wall_s": round(wall, 2),
    }, toks


def greedy_baseline(params, cfg, prompt, n_steps, chunk=64):
    """Fused-chunk greedy decode wall-clock (launches included)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from infinitensor_tpu.models.llama import (
        init_kv_cache, llama_decode_multi, llama_prefill)

    prompt = jnp.asarray(prompt, jnp.int32)
    B, S = prompt.shape
    cache = init_kv_cache(cfg, B, max_seq=max(cfg.max_seq,
                                              S + n_steps + chunk + 2))
    logits, cache = jax.jit(llama_prefill, static_argnums=1)(
        params, cfg, prompt, cache)
    tok = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
    pos = jnp.full((B,), S, jnp.int32)
    step = jax.jit(llama_decode_multi, static_argnums=(1, 5),
                   donate_argnums=4)
    first = np.asarray(tok, np.int32)[:, None]   # prefill-emitted token
    toks, tok2, pos2, cache2 = step(params, cfg, tok, pos, cache, chunk)
    np.asarray(toks)                         # compile + warm (cache donated)
    # rebuild state (the warm call consumed the cache)
    cache = init_kv_cache(cfg, B, max_seq=max(cfg.max_seq,
                                              S + n_steps + chunk + 2))
    _, cache = jax.jit(llama_prefill, static_argnums=1)(
        params, cfg, prompt, cache)
    tok = jnp.asarray(first[:, 0])
    pos = jnp.full((B,), S, jnp.int32)
    n_launch = max(1, n_steps // chunk)
    t0 = time.perf_counter()
    outs = [first]
    for _ in range(n_launch):
        toks, tok, pos, cache = step(params, cfg, tok, pos, cache, chunk)
        outs.append(np.asarray(toks))
    got = np.concatenate(outs, axis=1)[:, :n_steps]
    wall = time.perf_counter() - t0
    return {"tok_s": round(B * n_launch * chunk / wall, 1),
            "chunk": chunk, "launches": n_launch}, got


def trained_lm_section():
    """Spec decode on the trained order-2 Markov LM: real accept rates
    through the production path (prompt-lookup + small-model draft)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from tools.train_gate_lm import build_tables, make_sampler, train
    from infinitensor_tpu.models.llama import LlamaConfig
    from infinitensor_tpu.serving.speculative import (
        ModelDraft, PromptLookupDraft)

    vocab, seq = 256, 128
    main, alt = build_tables(vocab, seed=7)
    sampler = make_sampler(main, alt, vocab, seq)

    tgt_cfg = LlamaConfig(vocab_size=vocab, dim=256, n_layers=4,
                          n_heads=4, n_kv_heads=4, intermediate=512,
                          max_seq=1024, dtype=jnp.float32)
    steps = int(os.environ.get("SPEC_TRAIN_STEPS", "1500"))
    t0 = time.time()
    tgt = train(tgt_cfg, sampler, steps, 32, 1e-3, 250,
                jax.random.PRNGKey(0))
    emit("trained_lm.train_s", round(time.time() - t0, 1))

    # draft: a smaller model trained on the SAME language
    dr_cfg = LlamaConfig(vocab_size=vocab, dim=128, n_layers=2,
                         n_heads=4, n_kv_heads=4, intermediate=256,
                         max_seq=1024, dtype=jnp.float32)
    dr = train(dr_cfg, sampler, max(300, steps // 3), 32, 1e-3, 250,
               jax.random.PRNGKey(1))

    prompt = np.asarray(sampler(jax.random.PRNGKey(42), 1))[:, :64]
    n_steps = int(os.environ.get("SPEC_LM_STEPS", "192"))

    base, base_toks = greedy_baseline(tgt, tgt_cfg, prompt, n_steps,
                                      chunk=64)
    emit("trained_lm.greedy_fused_baseline", base)

    for K in (4, 8):
        row, toks = run_spec(tgt, tgt_cfg, prompt, n_steps, K,
                             draft=PromptLookupDraft(ngram=2))
        row["greedy_first_divergence"] = _first_div(toks, base_toks)
        emit(f"trained_lm.prompt_lookup_K{K}", row)

    for K in (4, 8):
        draft = ModelDraft(dr, dr_cfg, batch=1, max_seq=1024)
        row, toks = run_spec(tgt, tgt_cfg, prompt, n_steps, K,
                             draft=draft)
        row["greedy_first_divergence"] = _first_div(toks, base_toks)
        emit(f"trained_lm.model_draft_K{K}", row)


def main():
    def heartbeat():
        n = 0
        while True:
            time.sleep(120)
            n += 1
            print(f"# heartbeat {n}")

    import jax
    import jax.numpy as jnp
    import numpy as np

    small = os.environ.get("SPEC_SMALL")
    dev = jax.devices()[0]
    np.asarray(jnp.zeros((1,)))
    print(f"# device ready: {getattr(dev, 'device_kind', dev.platform)}")
    threading.Thread(target=heartbeat, daemon=True).start()

    from infinitensor_tpu.models.llama import LlamaConfig, init_kv_cache
    from bench import build_quant_params

    if small:
        cfg = LlamaConfig(vocab_size=2048, dim=512, n_layers=4,
                          n_heads=8, n_kv_heads=8, intermediate=1376,
                          max_seq=512)
    else:
        cfg = LlamaConfig(max_seq=1024)      # llama-2-7b geometry
    params = build_quant_params(cfg, jax.random.PRNGKey(0))
    np.asarray(jax.tree_util.tree_leaves(params)[-1].ravel()[:4])
    print("# 7b params built")

    cache_fn = functools.partial(init_kv_cache, cfg, kv_quant=True)
    mechanism(params, cfg, cache_fn, chunk=128,
              Ks=(2, 4) if small else (2, 4, 8))

    # measured end-to-end on the flagship config (random weights -> the
    # accept rate is an honest floor, the protocol is the real one)
    rng = np.random.default_rng(0)
    base = rng.integers(1, cfg.vocab_size, 24)
    prompt = np.concatenate([base, base, base[:16]])[None, :]  # repeats
    n_steps = 32 if small else 64
    gb, base_toks = greedy_baseline(params, cfg, prompt, n_steps,
                                    chunk=64)
    emit("measured_7b.greedy_fused_baseline", gb)
    for K in ((2, 4) if small else (2, 4, 8)):
        row, toks = run_spec(params, cfg, prompt, n_steps, K)
        row["greedy_first_divergence"] = _first_div(toks, base_toks)
        emit(f"measured_7b.prompt_lookup_K{K}", row)

    del params
    if not os.environ.get("SPEC_SKIP_TRAINED"):
        trained_lm_section()
    print(json.dumps({"metric": "spec bench", "sections": len(RESULTS)}))


if __name__ == "__main__":
    if (os.environ.get("BENCH_WATCHDOG", "1") == "1"
            and not os.environ.get("BENCH_CHILD")):
        from infinitensor_tpu.utils.watchdog import babysit
        sys.exit(babysit(
            [sys.executable, os.path.abspath(__file__)],
            quiet_s=600.0, gap_s=420.0, attempts=2,
            env=dict(os.environ, BENCH_CHILD="1")))
    main()
