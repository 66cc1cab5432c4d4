"""Paged-KV continuous-batching throughput on one chip.

Llama-family model served from a page pool (PagedServingEngine): the pool
is sized well below max_slots * max_seq, so this measures the config a
slot-contiguous cache cannot hold. Prints one JSON line.

Run: python tools/paged_serving_bench.py   (real TPU; one process at a time)
Env: PAGED_DIM/PAGED_LAYERS (default 1B-ish geometry for a fast number),
     PAGED_SLOTS, PAGED_PAGES, PAGED_PAGE_SIZE, PAGED_CHUNK, PAGED_KV=int8.
"""

import functools
import json
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "axon,tpu,cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
print = functools.partial(print, flush=True)


def main():
    import jax
    import numpy as np
    from infinitensor_tpu.models.llama import LlamaConfig, init_llama_params
    from infinitensor_tpu.serving.paged_engine import PagedServingEngine

    dim = int(os.environ.get("PAGED_DIM", "2048"))
    layers = int(os.environ.get("PAGED_LAYERS", "16"))
    cfg = LlamaConfig(vocab_size=32000, dim=dim, n_layers=layers,
                      n_heads=dim // 128, n_kv_heads=max(dim // 512, 1),
                      intermediate=int(dim * 2.6875) // 128 * 128,
                      max_seq=1024)
    # 64 slots: session13 slot sweep 8/16/24/32/48/64 = 1420/1907/2123/
    # 2306/2506/2578 tok/s (per-op decode latency amortizes across rows,
    # same lever as the dense engine's 64-slot default; curve flattens
    # at 64 — +2.8% over 48; docs/BENCH_NOTES.md)
    slots = int(os.environ.get("PAGED_SLOTS", "64"))
    page = int(os.environ.get("PAGED_PAGE_SIZE", "64"))
    n_pages = int(os.environ.get("PAGED_PAGES",
                                 str(slots * cfg.max_seq // page // 2)))
    # chunk=32: 827.2 tok/s vs 699.5 at chunk=8 (same launch-amortization
    # win as the dense serving bench)
    chunk = int(os.environ.get("PAGED_CHUNK", "32"))
    kv_quant = os.environ.get("PAGED_KV", "") == "int8"

    t0 = time.time()
    params = init_llama_params(cfg, jax.random.PRNGKey(0))
    # timing protocol: host fetch, not block_until_ready (which can return
    # early through the axon tunnel — CLAUDE.md); launches are ordered, so
    # fetching the last-created leaf bounds the build
    np.asarray(jax.tree_util.tree_leaves(params)[-1].ravel()[:8])
    build_s = time.time() - t0

    pipeline = int(os.environ.get("PAGED_PIPELINE", "4"))
    eng = PagedServingEngine(params, cfg, max_slots=slots,
        lookahead=os.environ.get("SERVE_LOOKAHEAD", "1") == "1", n_pages=n_pages,
                             page_size=page, prefill_buckets=(64, 256),
                             decode_chunk=chunk, kv_quant=kv_quant,
                             pipeline_depth=pipeline)
    t0 = time.time()
    eng.warmup()
    warmup_s = time.time() - t0

    rng = np.random.default_rng(0)
    # keep every slot busy for ~3 generations at any slot count (the
    # GPT-2 slot sweep used 3*slots; 24 preserves the historical 8-slot
    # workload byte-for-byte)
    n_req = int(os.environ.get("PAGED_NREQ", str(max(24, 3 * slots))))
    reqs = [eng.submit(list(rng.integers(1, 32000, int(n))),
                       max_new_tokens=64)
            for n in rng.integers(16, 250, n_req)]
    t0 = time.time()
    eng.run_to_completion()
    dt = time.time() - t0
    assert all(r.done for r in reqs)
    kv_tag = " int8kv" if kv_quant else ""
    result = {
        "metric": f"llama paged{kv_tag} continuous batching tokens/s "
                  f"({slots} slots, pool={n_pages}x{page})",
        "value": round(eng.tokens_out / dt, 1),
        "unit": "tokens/s",
        "requests": n_req,
        "decode_steps": eng.steps,
        "pool_tokens": n_pages * page,
        "slot_contiguous_tokens": slots * cfg.max_seq,
        "wall_s": round(dt, 1),
        "build_s": round(build_s, 1),
        "warmup_s": round(warmup_s, 1),
        "decode_chunk": chunk,
        "pipeline_depth": pipeline,
        "stats": {k: (round(v, 3) if isinstance(v, float) else v)
                  for k, v in eng.stats.items()},
    }
    print(json.dumps(result))


if __name__ == "__main__":
    from infinitensor_tpu.utils.watchdog import self_babysit
    self_babysit("PAGED_CHILD")   # tunnel-wedge babysitter; WATCHDOG=0 opts out
    main()
