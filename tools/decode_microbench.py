"""Per-component decode microbench at Llama-2-7B shapes on the real chip.

Times each decode-path op and reports achieved weight-bytes/s vs the
measured HBM roofline, isolating where the end-to-end 7B decode loses
bandwidth. (Analog of the reference operator-timer FFI,
reference python/infinitensor/operator_timer.py.)
"""

import functools
import json
import os
import time

os.environ.setdefault("JAX_PLATFORMS", "axon,tpu,cpu")

import jax
import jax.numpy as jnp


def timeit(fn, *args, warmup=2, iters=20):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def main():
    from infinitensor_tpu.quant.weight_only import QuantizedLinear
    from infinitensor_tpu.kernels.quant_matmul import quant_matmul
    from infinitensor_tpu.kernels.attention import flash_decode
    from infinitensor_tpu.kernels.norms import rmsnorm

    bits = int(os.environ.get("BENCH_BITS", "8"))
    B = int(os.environ.get("BENCH_BATCH", "1"))
    group = 128
    key = jax.random.PRNGKey(0)
    results = {}

    # 7B decode matmul shapes: qkv 4096->12288, o 4096->4096,
    # gate+up 4096->22016, down 11008->4096, lm_head 4096->32000
    shapes = [("qkv", 4096, 12288), ("o", 4096, 4096),
              ("gate_up", 4096, 22016), ("down", 11008, 4096),
              ("lm_head", 4096, 32000)]
    for name, din, dout in shapes:
        k1, k2, key = jax.random.split(key, 3)
        qw = jax.random.randint(k1, (din if bits == 8 else din // 2, dout),
                                -127, 127, jnp.int8)
        sc = jax.random.uniform(k2, (din // group, dout), jnp.float32,
                                0.001, 0.02)
        q = QuantizedLinear(qw, sc, bits, group)
        x = jnp.ones((B, din), jnp.bfloat16)
        fn = jax.jit(lambda x, q=q: quant_matmul(x, q))
        ms = timeit(fn, x)
        wbytes = qw.size + sc.size * 4
        results[name] = {"ms": round(ms, 4),
                         "gbps": round(wbytes / ms / 1e6, 1)}

    # flash decode attention: 32 heads, hd 128, ctx 1024
    S = int(os.environ.get("BENCH_CTX", "1024"))
    kc = jnp.zeros((B, 32, S, 128), jnp.bfloat16)
    vc = jnp.zeros((B, 32, S, 128), jnp.bfloat16)
    qv = jnp.ones((B, 32, 1, 128), jnp.bfloat16)
    pos = jnp.full((B,), S - 2, jnp.int32)
    fn = jax.jit(lambda q, k, v, p: flash_decode(q, k, v, p))
    ms = timeit(fn, qv, kc, vc, pos)
    results["flash_decode_x32"] = {"ms": round(ms * 32, 4)}

    # rmsnorm
    x = jnp.ones((B, 1, 4096), jnp.bfloat16)
    g = jnp.ones((4096,), jnp.bfloat16)
    fn = jax.jit(lambda x, g: rmsnorm(x, g))
    results["rmsnorm_x65"] = {"ms": round(timeit(fn, x, g) * 65, 4)}

    total_mm = sum(results[n]["ms"] for n in
                   ("qkv", "o", "gate_up", "down"))
    results["_summary"] = {
        "per_layer_matmul_ms": round(total_mm, 4),
        "x32_plus_head_ms": round(total_mm * 32 + results["lm_head"]["ms"],
                                  3),
    }
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
