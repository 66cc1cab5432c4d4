"""Continuous-batching Llama serving demo (reference
examples/python/llama_kvcache_inference.py analog, with batching the
reference lacks). Runs a small random-weight model; for real weights load a
params pytree of the same structure (models/llama.py)."""

import sys
import time

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp
    from infinitensor_tpu.models.llama import (
        LlamaConfig, init_llama_params, quantize_llama_params)
    from infinitensor_tpu.serving import ServingEngine

    cfg = LlamaConfig(vocab_size=2048, dim=512, n_layers=4, n_heads=8,
                      n_kv_heads=8, intermediate=1376, max_seq=256)
    params = init_llama_params(cfg, jax.random.PRNGKey(0))
    params = quantize_llama_params(params, bits=8, group_size=128)

    import os
    eng = ServingEngine(params, cfg, max_slots=4, prefill_buckets=(32, 128),
                        kv_quant=os.environ.get("KV", "") == "int8")
    rng = __import__("numpy").random.default_rng(0)
    reqs = [eng.submit(list(rng.integers(1, 2000, int(n))),
                       max_new_tokens=24)
            for n in rng.integers(4, 30, 8)]
    t0 = time.perf_counter()
    eng.run_to_completion()
    dt = time.perf_counter() - t0
    print(f"served {len(reqs)} requests, {eng.tokens_out} tokens in "
          f"{dt:.2f}s -> {eng.tokens_out / dt:.1f} tok/s "
          f"({eng.steps} decode steps)")
    for r in reqs[:3]:
        print(f"  req {r.uid}: prompt {len(r.prompt)} toks -> "
              f"{r.generated[:8]}...")


if __name__ == "__main__":
    main()
