"""GPT-2 345M INT8 continuous-batching throughput on one chip
(BASELINE config 3: "GPT-2 345M INT8 weight-only with KV-cache, continuous
batching on 1 host — functional + throughput report").

Run: python tools/serving_bench.py  (uses the real TPU; one process at a time)
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, ".")
print = functools.partial(print, flush=True)


def main():
    import jax
    import numpy as np
    from infinitensor_tpu.models.gpt2 import (
        GPT2Config, init_gpt2_params, quantize_gpt2_params, gpt2_prefill,
        gpt2_decode_step, init_gpt2_cache)
    from infinitensor_tpu.serving import ServingEngine

    # cache sized to the workload (prompts <= 250 + 64 new + chunk slack):
    # the flash decode reads whole cache blocks, so dead rows in a 1024
    # cache were ~2/3 of the serving engine's HBM traffic
    # (docs/SERVING_BUDGET.json); 345M geometry otherwise
    cfg = GPT2Config(max_seq=int(os.environ.get("SERVE_MAXSEQ", "384")))
    # int8 KV measured SLOWER for GPT-2 at batch 16 (1203-1232 vs
    # 1697.9 tok/s): flash_decode_q8's 24 KB per-(b,h) blocks + scale
    # folding lose more than the halved bytes buy at D=64/S=384 —
    # the knob stays for long-context configs where bytes dominate
    kv_int8 = os.environ.get("SERVE_KV", "none") == "int8"
    t0 = time.time()
    params = init_gpt2_params(cfg, jax.random.PRNGKey(0))
    params = quantize_gpt2_params(
        params, bits=8, group_size=128,
        quant_lm_head=os.environ.get("GPT2_QLMHEAD", "1") == "1")
    # host fetch, not block_until_ready (early-return hazard, CLAUDE.md)
    np.asarray(jax.tree_util.tree_leaves(params)[-1].ravel()[:8])
    build_s = time.time() - t0

    # chunk sweep history: 8/16/32/64 -> 652.6/780.5/896.8/929.7 (r2,
    # 8 slots); with batched admission + pipelining, chunk=64 x depth=2
    # beats 32 x 4 (1743.9 vs 1705.8, r4) — same launch count per fetch
    # group, fewer scheduler turns. eos-heavy workloads may prefer 32
    # (a finished request wastes the chunk remainder).
    chunk = int(os.environ.get("SERVE_CHUNK", "64"))
    # 16 slots: 974.5 tok/s vs 896.8 at 8 (weights amortize further;
    # spread 3.7%) — the default serving geometry
    # slot sweep (round 5): 16/24/32/48/64/96 -> 1834/1940/1920/2100/
    # 2130/2008 tok/s. Per-step device time grows sublinearly in B
    # (latency-bound op floor amortizes) until KV reads dominate past
    # ~64; 64 is the single-chip throughput point, 16 the latency point
    slots = int(os.environ.get("SERVE_SLOTS", "64"))
    # pipeline_depth 4: dispatch up to 4 fused chunks before fetching
    # tokens — overlaps the ~27 ms tunnel launch with on-device compute
    pipeline = int(os.environ.get("SERVE_PIPELINE", "2"))
    init_cache = functools.partial(init_gpt2_cache, kv_quant=True) \
        if kv_int8 else init_gpt2_cache
    eng = ServingEngine(params, cfg, max_slots=slots,
        lookahead=os.environ.get("SERVE_LOOKAHEAD", "1") == "1",
                        prefill_buckets=(64, 256),
                        prefill_fn=gpt2_prefill, decode_fn=gpt2_decode_step,
                        init_cache_fn=init_cache, decode_chunk=chunk,
                        pipeline_depth=pipeline)
    t0 = time.time()
    eng.warmup()
    warmup_s = time.time() - t0
    rng = np.random.default_rng(0)
    n_req = max(24, 3 * slots)
    # variance discipline (round-2 verdict): repeat the measured segment
    # in-process and report every sample + the spread; headline = best
    # (the reference's timeit runs warmup+rounds the same way,
    # common.h:93)
    reps = int(os.environ.get("SERVE_REPS", "2"))
    samples = []
    all_done = True
    # one FIXED workload reused every rep: reps must measure run-to-run
    # noise, not prompt-length resampling
    lens = rng.integers(16, 250, n_req)
    prompts = [list(rng.integers(1, 50000, int(n))) for n in lens]
    stats = None
    for _ in range(max(1, reps)):
        base_tokens, base_steps = eng.tokens_out, eng.steps
        eng.stats.clear()
        reqs = [eng.submit(list(p), max_new_tokens=64) for p in prompts]
        t0 = time.time()
        eng.run_to_completion()
        dt = time.time() - t0
        sample = round((eng.tokens_out - base_tokens) / dt, 1)
        if not samples or sample >= max(samples):
            stats = {k: (round(v, 4) if isinstance(v, float) else v)
                     for k, v in eng.stats.items()}
        samples.append(sample)
        all_done &= all(r.done for r in reqs)
        steps = eng.steps - base_steps
        wall = dt
    best = max(samples)
    result = {
        "metric": f"gpt2-345m int8{'+kv8' if kv_int8 else ''} continuous batching tokens/s "
                  f"({slots} slots)",
        "value": best,
        "unit": "tokens/s",
        "samples": samples,
        "spread_pct": round(100.0 * (best - min(samples)) / best, 1),
        "requests": n_req,
        "decode_steps": steps,
        "wall_s": round(wall, 1),
        "build_s": round(build_s, 1),
        "warmup_s": round(warmup_s, 1),
        "decode_chunk": chunk,
        "pipeline_depth": pipeline,
        "stats": stats,
    }
    print(json.dumps(result))
    assert all_done


if __name__ == "__main__":
    from infinitensor_tpu.utils.watchdog import self_babysit
    self_babysit("SERVE_CHILD")   # tunnel-wedge babysitter; WATCHDOG=0 opts out
    main()
