"""Prefill throughput + MFU at Llama-2-7B geometry (round-4 verdict item 4
— the repo's first compute-side artifact; decode numbers are HBM-bound,
prefill is where the MXU matters).

Measures bf16 prefill at (bs=1, S=1024) and (bs=8, S=256) with the
host-fetch chained two-point protocol (ONE executable, runtime trip count,
min-of-3), reports achieved model FLOP/s vs the chip's bf16 MXU peak.

Model FLOPs counted per token: 2 * matmul params (dense projections +
lm_head on the LAST position only is excluded — prefill computes logits
for every position here, so lm_head counts fully) + attention
(4 * S_avg * dim per token for QK^T and PV at causal average S/2 * 2
matrices). The reference times per-kernel via its tune loop
(src/kernels/cuda/matmul.cc:25-187); this reports whole-prefill MFU.

Run: python tools/prefill_mfu.py   (real TPU)
Env: MFU_PEAK_TFLOPS (default 197, v5e bf16), MFU_SMALL=1 tiny smoke.
Writes docs/PREFILL_MFU.json.
"""

import functools
import json
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "axon,tpu,cpu")
_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
print = functools.partial(print, flush=True)


def model_prefill_flops(cfg, batch, S):
    """Dense-matmul + attention FLOPs for one prefill of [batch, S]."""
    kvd = cfg.n_kv_heads * cfg.head_dim
    per_tok_matmul = 2 * (
        cfg.dim * (cfg.dim + 2 * kvd)          # qkv
        + cfg.dim * cfg.dim                    # wo
        + 3 * cfg.dim * cfg.intermediate       # gate/up/down
    ) * cfg.n_layers + 2 * cfg.dim * cfg.vocab_size   # lm_head all pos
    matmul = per_tok_matmul * batch * S
    # causal attention: QK^T + PV, each 2*D MACs per (q, k) pair,
    # sum_{i<=S} i ~ S^2/2 pairs per head
    attn = cfg.n_layers * cfg.n_heads * (S * S / 2) * 4 * cfg.head_dim \
        * batch
    return matmul + attn


def measure(cfg, batch, S, reps=3):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from infinitensor_tpu.models.llama import (
        init_kv_cache, init_llama_params, llama_prefill)

    params = init_llama_params(cfg, jax.random.PRNGKey(0),
                               dtype=jnp.bfloat16)
    np.asarray(jax.tree_util.tree_leaves(params)[-1].ravel()[:4])

    # chained two-point: n prefills in ONE executable, each pass's input
    # tokens perturbed by the previous pass's logits so XLA cannot CSE.
    # params flow through jit ARGUMENTS — a closure-captured 13.5 GB
    # param tree becomes HLO constants and stalls the remote compiler
    # (CLAUDE.md jit-closure-constants)
    def chained(params, tokens, n):
        def body(i, carry):
            toks, acc = carry
            cache = init_kv_cache(cfg, batch, max_seq=S, dtype=jnp.bfloat16)
            logits, _ = llama_prefill(params, cfg, toks, cache)
            bump = jnp.argmax(logits[:, -1]).astype(jnp.int32) % 7
            return (jnp.clip(toks + bump, 0, cfg.vocab_size - 1),
                    acc + logits[0, -1, 0].astype(jnp.float32))
        toks, acc = jax.lax.fori_loop(0, n, body,
                                      (tokens, jnp.float32(0)))
        return acc

    f = jax.jit(chained)
    tokens = jnp.ones((batch, S), jnp.int32)
    t0 = time.time()
    np.asarray(f(params, tokens, jnp.int32(1)))
    compile_s = time.time() - t0

    def run_n(n):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(f(params, tokens, jnp.int32(n)))
            best = min(best, time.perf_counter() - t0)
        return best

    n_hi = 5
    dt = (run_n(n_hi) - run_n(1)) / (n_hi - 1)
    flops = model_prefill_flops(cfg, batch, S)
    return {
        "batch": batch, "seq": S,
        "prefill_s": round(dt, 4),
        "tokens_s": round(batch * S / dt, 1),
        "model_tflops": round(flops / 1e12, 3),
        "achieved_tflops_s": round(flops / dt / 1e12, 1),
        "compile_s": round(compile_s, 1),
    }


def main():
    import jax
    import numpy as np
    from infinitensor_tpu.models.llama import LlamaConfig

    dev0 = jax.devices()[0]
    np.asarray(jax.numpy.zeros((1,)))
    print(f"# device ready: {getattr(dev0, 'device_kind', dev0.platform)}",
          file=sys.stderr)

    peak = float(os.environ.get("MFU_PEAK_TFLOPS", "197"))
    if os.environ.get("MFU_SMALL"):
        import jax.numpy as jnp
        cfg = LlamaConfig(vocab_size=2048, dim=512, n_layers=2, n_heads=8,
                          n_kv_heads=8, intermediate=1408, max_seq=256,
                          dtype=jnp.bfloat16)
        shapes = [(1, 128)]
    else:
        # MFU_LAYERS < 32 is the OOM fallback (13.5 GB bf16 weights on a
        # 16 GB chip is tight): layers are identical, so whole-model MFU
        # equals the truncated-model MFU up to the (counted) lm_head share
        layers = int(os.environ.get("MFU_LAYERS", "32"))
        cfg = LlamaConfig(max_seq=1024, n_layers=layers)   # 7B geometry
        shapes = [(1, 1024), (8, 256)]

    rows = []
    for batch, S in shapes:
        cfg_run = LlamaConfig(**{**cfg.__dict__, "max_seq": S})
        r = measure(cfg_run, batch, S)
        r["mfu_vs_peak"] = round(r["achieved_tflops_s"] / peak, 3)
        rows.append(r)
        print(f"# bs={batch} S={S}: {r['tokens_s']} tok/s, "
              f"{r['achieved_tflops_s']} TFLOP/s, MFU {r['mfu_vs_peak']}",
              file=sys.stderr)

    art = {
        "metric": "llama2-7b bf16 prefill throughput + MFU",
        "peak_tflops_assumed": peak,
        "method": "chained two-point (1 vs 5 prefills in one executable, "
                  "argmax-perturbed inputs), min-of-3, host fetch",
        "rows": rows,
        "device": str(dev0),
    }
    with open(os.path.join(_ROOT, "docs", "PREFILL_MFU.json"), "w") as f:
        json.dump(art, f, indent=1)
    print(json.dumps(art))


if __name__ == "__main__":
    if (os.environ.get("BENCH_WATCHDOG", "1") == "1"
            and not os.environ.get("BENCH_CHILD")):
        from infinitensor_tpu.utils.watchdog import babysit
        sys.exit(babysit(
            [sys.executable, os.path.abspath(__file__)],
            quiet_s=600.0, gap_s=420.0, attempts=2,
            env=dict(os.environ, BENCH_CHILD="1")))
    main()
