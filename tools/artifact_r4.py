"""Round-4 one-session on-chip artifact collection.

One device claim, sequential stages (tunnel allows one TPU process and
wedges between processes — CLAUDE.md):

  1. serving_bench      batched-admission + pipelined serving throughput
  2. serving_budget     utilization budget -> docs/SERVING_BUDGET.json
  3. prefill_mfu        first compute-side artifact -> docs/PREFILL_MFU.json
  4. graph_llm_7b       graph-IR flagship decode, same-session A/B vs the
                        hand-written path -> docs/GRAPH_LLM_7B.json

Each stage is independent; failures are recorded and the session moves
on. Writes docs/ARTIFACTS_R4.json with per-stage status.
"""

import functools
import gc
import json
import os
import sys
import threading
import time
import traceback

os.environ.setdefault("JAX_PLATFORMS", "axon,tpu,cpu")
_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "tools"))
print = functools.partial(print, flush=True)

OUT = os.path.join(_ROOT, "docs", "ARTIFACTS_R4.json")
STATUS: dict = {}


def stage(name):
    def deco(fn):
        def run():
            print(f"# ==== stage {name} ====")
            t0 = time.time()
            try:
                fn()
                STATUS[name] = {"ok": True, "s": round(time.time() - t0, 1)}
            except Exception as e:  # noqa: BLE001
                STATUS[name] = {"ok": False, "error": repr(e)[:300],
                                "s": round(time.time() - t0, 1)}
                traceback.print_exc()
            gc.collect()
            with open(OUT, "w") as f:
                json.dump(STATUS, f, indent=1)
        run.__name__ = name
        return run
    return deco


@stage("serving_bench")
def s_serving():
    import serving_bench
    serving_bench.main()


@stage("serving_budget")
def s_budget():
    import serving_budget
    serving_budget.main()


@stage("prefill_mfu")
def s_mfu():
    import prefill_mfu
    prefill_mfu.main()


@stage("graph_llm_7b")
def s_graph7b():
    """Graph-IR quantized GQA decode at FLAGSHIP geometry (verdict item
    3): build the 7B INT4+KV8 decode graph from MatMulWOQ /
    AttentionKVCacheQ8 ops, bind bench.py's on-device quantized params
    (no host round trip), decode through GraphExecutor with the fused
    multi-step scan, and A/B the hand-written fast path on the SAME
    params in the SAME session. Reference anchor:
    examples/python/llama_kvcache_inference.py:102-144 (the reference
    proves its engine at its flagship config)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from bench import build_quant_params
    from infinitensor_tpu.models.llama import (
        LlamaConfig, init_kv_cache, llama_decode_multi)
    from infinitensor_tpu.models.graph_llama import (
        bind_llama_weights, build_llama_decoder, make_fused_greedy_decode)
    from infinitensor_tpu.runtime.executor import GraphExecutor

    ctx, multi, outer, reps = 1024, 128, 2, int(
        os.environ.get("ARTIFACT_REPS", "3"))
    max_seq = (ctx + multi * outer + 2 + 127) // 128 * 128
    small = os.environ.get("ARTIFACT_SMALL")
    if small:
        cfg = LlamaConfig(vocab_size=2048, dim=512, n_layers=2, n_heads=8,
                          n_kv_heads=8, intermediate=1408,
                          max_seq=max_seq)
        ctx, multi, outer, reps = 64, 8, 2, 1
        max_seq = 256
        cfg = LlamaConfig(**{**cfg.__dict__, "max_seq": max_seq})
    else:
        cfg = LlamaConfig(max_seq=max_seq)          # 7B geometry

    t0 = time.time()
    params = build_quant_params(cfg, jax.random.PRNGKey(0))
    params = jax.block_until_ready(params)
    build_s = time.time() - t0
    print(f"# params built in {build_s:.1f}s")

    def fresh_state(names_shapes):
        return {n: jnp.zeros(s, d) for n, (s, d) in names_shapes.items()}

    # ---- graph-IR path ------------------------------------------------
    t0 = time.time()
    dec = build_llama_decoder(params, cfg, batch=1, kv_quant=True,
                              external_weights=True)
    ex = GraphExecutor(dec.graph)
    bind_llama_weights(dec, ex, params)
    fn, weights, state0 = make_fused_greedy_decode(dec, executor=ex,
                                                   multi=multi)
    graph_build_s = time.time() - t0
    print(f"# graph built in {graph_build_s:.1f}s "
          f"({len(list(dec.graph.operators))} ops)")

    tok0 = jnp.zeros((1,), jnp.int32)
    pos0 = jnp.full((1,), ctx, jnp.int32)
    state_spec = {n: (v.shape, v.dtype) for n, v in state0.items()}

    t0 = time.time()
    toks, state = fn(weights, tok0, pos0, state0)
    np.asarray(toks)
    graph_compile_s = time.time() - t0
    print(f"# graph compiled in {graph_compile_s:.1f}s")

    g_samples = []
    for _ in range(reps):
        state = fresh_state(state_spec)
        state = jax.block_until_ready(state)
        tok, pos = tok0, pos0
        t0 = time.time()
        for _ in range(outer):
            toks, state = fn(weights, tok, pos, state)
            tok = toks[:, -1]
            pos = pos + multi
        np.asarray(toks)
        g_samples.append(time.time() - t0)
        print(f"# graph decode region: {g_samples[-1]:.3f}s")
    del state
    gc.collect()
    g_tok_s = outer * multi / min(g_samples)

    # ---- hand-written path, same params, same session -----------------
    step = jax.jit(
        lambda p, t, ps, c: llama_decode_multi(p, cfg, t, ps, c, multi),
        donate_argnums=(3,))
    cache = init_kv_cache(cfg, 1, kv_quant=True)
    cache = jax.block_until_ready(cache)
    t0 = time.time()
    toks, tok, pos, cache = step(params, tok0, pos0, cache)
    np.asarray(toks)
    hand_compile_s = time.time() - t0
    h_samples = []
    for _ in range(reps):
        cache = init_kv_cache(cfg, 1, kv_quant=True)
        cache = jax.block_until_ready(cache)
        tok, pos = tok0, pos0
        t0 = time.time()
        for _ in range(outer):
            toks, tok, pos, cache = step(params, tok, pos, cache)
        np.asarray(toks)
        h_samples.append(time.time() - t0)
        print(f"# hand decode region: {h_samples[-1]:.3f}s")
    h_tok_s = outer * multi / min(h_samples)

    art = {
        "metric": "llama2-7b int4+kv8 decode through the GRAPH IR "
                  "(MatMulWOQ + AttentionKVCacheQ8 ops, fused multi-step "
                  "scan) vs hand-written fast path, same params, same "
                  "session",
        "config": {"ctx": ctx, "multi": multi, "steps": outer * multi,
                   "max_seq": cfg.max_seq, "small": bool(small)},
        "graph_tokens_s": round(g_tok_s, 2),
        "hand_tokens_s": round(h_tok_s, 2),
        "graph_vs_hand": round(g_tok_s / h_tok_s, 4),
        "graph_ms_per_token": round(1e3 * min(g_samples)
                                    / (outer * multi), 3),
        "samples_s": {"graph": [round(s, 3) for s in g_samples],
                      "hand": [round(s, 3) for s in h_samples]},
        "compile_s": {"graph": round(graph_compile_s, 1),
                      "hand": round(hand_compile_s, 1)},
        "build_s": round(build_s, 1),
        "graph_ops": len(list(dec.graph.operators)),
        "device": str(jax.devices()[0]),
    }
    with open(os.path.join(_ROOT, "docs", "GRAPH_LLM_7B.json"), "w") as f:
        json.dump(art, f, indent=1)
    print(json.dumps(art))


def main():
    def heartbeat():
        n = 0
        while True:
            time.sleep(120)
            n += 1
            print(f"# heartbeat {n}")

    import jax
    import numpy as np
    np.asarray(jax.numpy.zeros((1,)))
    print(f"# device ready: {jax.devices()[0]}")
    # heartbeats AFTER the claim (claim silence = watchdog wedge signal)
    threading.Thread(target=heartbeat, daemon=True).start()
    only = os.environ.get("ARTIFACT_ONLY")
    stages = [s_serving, s_budget, s_mfu, s_graph7b]
    for s in stages:
        if only and not any(tok and tok in s.__name__
                            for tok in only.split(",")):
            continue
        s()
    print(json.dumps({"metric": "r4 artifact session", "status": STATUS}))


if __name__ == "__main__":
    if (os.environ.get("BENCH_WATCHDOG", "1") == "1"
            and not os.environ.get("BENCH_CHILD")):
        from infinitensor_tpu.utils.watchdog import babysit
        sys.exit(babysit(
            [sys.executable, os.path.abspath(__file__)],
            quiet_s=600.0, gap_s=420.0, attempts=2,
            env=dict(os.environ, BENCH_CHILD="1")))
    main()
