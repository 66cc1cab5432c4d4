"""Microbench for the dequant-matmul kernel at decode shapes.

Two-point host-fetch timing (see tools/bw_diag.py): time K chained matmuls
for K in {1, 9}; per-call time = (t9 - t1) / 8. Reports effective weight
stream GB/s per variant. Usage: python tools/quant_kernel_bench.py [bits]
"""
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "axon,tpu,cpu")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from infinitensor_tpu.quant.weight_only import quantize_weight  # noqa: E402
from infinitensor_tpu.kernels.quant_matmul import quant_matmul  # noqa: E402


def timed_chain(fn, x0, n, reps=3):
    def chain(x):
        def body(i, a):
            out = fn(x + a.astype(x.dtype))
            return jnp.mean(out).astype(jnp.float32) * 1e-30
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))
    f = jax.jit(chain)
    np.asarray(f(x0))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(f(x0))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    bits = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    batch = int(os.environ.get("QB_BATCH", "1"))
    din = int(os.environ.get("QB_DIN", "4096"))
    dout = int(os.environ.get("QB_DOUT", "22016"))
    key = jax.random.PRNGKey(0)
    w = jax.random.normal(key, (din, dout), jnp.float32) * 0.02
    q = quantize_weight(w, bits=bits, group_size=128)
    q = jax.block_until_ready(q)
    x = jnp.ones((batch, din), jnp.bfloat16)
    wbytes = int(q.qweight.size) + 4 * int(q.scales.size)

    # correctness check first
    from infinitensor_tpu.kernels.quant_matmul import quant_matmul_ref
    got = np.asarray(quant_matmul(x, q).astype(jnp.float32))
    ref = np.asarray(quant_matmul_ref(x, q).astype(jnp.float32))
    err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
    print(f"bits={bits} rel_err={err:.2e}", flush=True)

    # n-point diff large enough that the compute delta dwarfs the ~1 ms
    # jitter on the ~28 ms per-launch tunnel round-trip
    lo_n, hi_n = 8, 72
    t_lo = timed_chain(lambda xx: quant_matmul(xx, q), x, lo_n)
    t_hi = timed_chain(lambda xx: quant_matmul(xx, q), x, hi_n)
    per = (t_hi - t_lo) / (hi_n - lo_n)
    print(f"pallas int{bits}: {per*1e3:.3f} ms/call -> "
          f"{wbytes/per/1e9:.1f} GB/s", flush=True)

    if os.environ.get("QB_XLA"):
        t_lo = timed_chain(lambda xx: quant_matmul_ref(xx, q), x, lo_n)
        t_hi = timed_chain(lambda xx: quant_matmul_ref(xx, q), x, hi_n)
        per = (t_hi - t_lo) / (hi_n - lo_n)
        print(f"xla ref int{bits}: {per*1e3:.3f} ms/call -> "
              f"{wbytes/per/1e9:.1f} GB/s", flush=True)


if __name__ == "__main__":
    main()
