"""Headline benchmark: Llama-2-7B INT8 weight-only decode on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
vs_baseline = measured tokens/sec divided by the HBM-bandwidth roofline for
weight-only INT8 decode on this chip (the reference publishes no absolute
numbers — BASELINE.md — so roofline fraction is the honest denominator; the
BASELINE.json target is >=85% of dequant+matmul roofline).

Weights are randomly generated *directly in quantized form* on-device; decode
throughput does not depend on weight values.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "axon,tpu,cpu")


def build_quant_params(cfg, key):
    import jax
    import jax.numpy as jnp
    from infinitensor_tpu.quant.weight_only import QuantizedLinear

    # batch-generate per weight category (one RNG call for all layers —
    # per-call dispatch latency through the device tunnel dominates
    # otherwise), then split into per-layer arrays.
    kvd = cfg.n_kv_heads * cfg.head_dim
    L = cfg.n_layers
    k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)

    bits = int(os.environ.get("BENCH_BITS", "8"))

    def qlin_stack(k, din, dout, bits=bits, group=128):
        while din % group:
            group //= 2
        kq, ks = jax.random.split(k)
        q = jax.random.randint(kq, (L, din if bits == 8 else din // 2, dout),
                               -127, 127, jnp.int8)
        scales = jax.random.uniform(ks, (L, din // group, dout), jnp.float32,
                                    0.001, 0.02)
        return [QuantizedLinear(q[i], scales[i], bits, group)
                for i in range(L)]

    wqkv = qlin_stack(k1, cfg.dim, cfg.dim + 2 * kvd)
    wo = qlin_stack(k2, cfg.dim, cfg.dim)
    wgu = qlin_stack(k3, cfg.dim, 2 * cfg.intermediate)
    wdn = qlin_stack(k4, cfg.intermediate, cfg.dim)
    layers = [{
        "attn_norm": jnp.ones((cfg.dim,), cfg.dtype),
        "wqkv": wqkv[i], "wo": wo[i],
        "mlp_norm": jnp.ones((cfg.dim,), cfg.dtype),
        "w_gateup": wgu[i], "w_down": wdn[i],
    } for i in range(L)]
    embed = (jax.random.normal(k5, (cfg.vocab_size, cfg.dim), jnp.float32)
             * 0.02).astype(cfg.dtype)

    def qlin(k, din, dout, bits=bits, group=128):
        while din % group:
            group //= 2
        kq, ks = jax.random.split(k)
        q = jax.random.randint(kq, (din if bits == 8 else din // 2, dout),
                               -127, 127, jnp.int8)
        scales = jax.random.uniform(ks, (din // group, dout), jnp.float32,
                                    0.001, 0.02)
        return QuantizedLinear(q, scales, bits, group)

    return {
        "embed": embed,
        "final_norm": jnp.ones((cfg.dim,), cfg.dtype),
        "lm_head": qlin(k6, cfg.dim, cfg.vocab_size),
        "layers": layers,
    }


def measure_hbm_bw(params) -> float:
    """Calibrate achievable HBM read bandwidth on this chip by timing a
    full sweep over the model's own weight buffers (varying scalar arg so
    nothing can be cached/elided across calls). The chip behind the axon
    tunnel is not necessarily the v5e the compile target names — measured
    ~12.5 TB/s here — so a hardcoded 819 GB/s roofline would be fiction."""
    import time
    import jax
    import jax.numpy as jnp

    qs = [layer[k].qweight for layer in params["layers"]
          for k in layer if hasattr(layer[k], "qweight")]
    total = sum(int(q.size) for q in qs)

    def rd(x, qs_):
        return x + sum(q.astype(jnp.int32).sum() for q in qs_)

    f = jax.jit(rd)
    jax.block_until_ready(f(jnp.int32(0), qs))
    t0 = time.perf_counter()
    n = 10
    for i in range(n):
        out = f(jnp.int32(i), qs)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    return total / dt  # bytes/s


def weight_bytes_per_token(cfg, bits=8):
    kvd = cfg.n_kv_heads * cfg.head_dim
    per_layer = (cfg.dim * cfg.dim * 2 + cfg.dim * kvd * 2
                 + cfg.dim * cfg.intermediate * 3)
    total = per_layer * cfg.n_layers + cfg.dim * cfg.vocab_size
    return total * bits / 8


def main():
    import jax
    import jax.numpy as jnp
    from infinitensor_tpu.models.llama import (
        LlamaConfig, init_kv_cache, llama_decode_step)

    batch = int(os.environ.get("BENCH_BATCH", "1"))
    seq_ctx = int(os.environ.get("BENCH_CTX", "1024"))
    steps = int(os.environ.get("BENCH_STEPS", "32"))
    cfg = LlamaConfig(max_seq=2048)  # llama-2-7b geometry
    if os.environ.get("BENCH_SMALL"):
        cfg = LlamaConfig(vocab_size=2048, dim=512, n_layers=4, n_heads=8,
                          n_kv_heads=8, intermediate=1376, max_seq=256)
        seq_ctx = min(seq_ctx, 128)

    dev = jax.devices()[0]
    t0 = time.time()
    params = build_quant_params(cfg, jax.random.PRNGKey(0))
    cache = init_kv_cache(cfg, batch)
    params, cache = jax.block_until_ready((params, cache))
    build_s = time.time() - t0

    token = jnp.zeros((batch,), jnp.int32)
    pos = jnp.full((batch,), seq_ctx, jnp.int32)

    step = jax.jit(lambda p, t, ps, c: llama_decode_step(p, cfg, t, ps, c),
                   donate_argnums=(3,))
    t0 = time.time()
    logits, cache = step(params, token, pos, cache)
    jax.block_until_ready(logits)
    compile_s = time.time() - t0

    # timed loop
    t0 = time.time()
    for i in range(steps):
        logits, cache = step(params, token, pos, cache)
    jax.block_until_ready(logits)
    dt = time.time() - t0
    tok_s = batch * steps / dt

    # roofline: weight stream + kv-cache read per decoded token
    if os.environ.get("BENCH_HBM_GBPS"):
        hbm_gbps = float(os.environ["BENCH_HBM_GBPS"])
    else:
        hbm_gbps = measure_hbm_bw(params) / 1e9
    kv_bytes = (2 * cfg.n_layers * cfg.n_kv_heads * seq_ctx * cfg.head_dim
                * 2)  # bf16 cache read
    bits = int(os.environ.get("BENCH_BITS", "8"))
    bytes_per_tok = weight_bytes_per_token(cfg, bits) / batch + kv_bytes
    roofline = hbm_gbps * 1e9 / bytes_per_tok

    result = {
        "metric": f"llama2-7b int{bits} decode tokens/sec/chip "
                  f"(bs={batch}, ctx={seq_ctx})",
        "value": round(tok_s, 2),
        "unit": "tokens/s",
        "vs_baseline": round(tok_s / (roofline * batch), 4),
        "roofline_tokens_s": round(roofline * batch, 1),
        "per_token_ms": round(1e3 * dt / steps, 3),
        "compile_s": round(compile_s, 1),
        "build_s": round(build_s, 1),
        "hbm_gbps_measured": round(hbm_gbps, 1),
        "device": str(dev),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
