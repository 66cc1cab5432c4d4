"""Diagnose decode-vs-roofline inconsistency on the tunneled TPU.

Three measurements, each with host-fetch verification (np.asarray of the
result) so async-dispatch / block_until_ready artifacts cannot fake times:

1. scan-scaling: llama_decode_multi with n_steps in {4, 32}; the per-step
   time is (t32 - t4) / 28 — launch latency and fixed overheads cancel.
2. matmul-chain scaling: the bench calibrator sweep with n in {1, 5};
   per-sweep time = (t5 - t1) / 4.
3. raw int8 reduce sweep over all weights, same two-point method.
"""
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "axon,tpu,cpu")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import build_quant_params  # noqa: E402
from infinitensor_tpu.models.llama import (  # noqa: E402
    LlamaConfig, init_kv_cache, llama_decode_multi)
from infinitensor_tpu.quant.weight_only import wo_matmul  # noqa: E402


def timed(f, *args):
    # host-fetch after the warmup too: on this experimental platform
    # block_until_ready can return before execution finishes, which would
    # start the timer while the warmup (and its compile) is still in
    # flight. np.asarray of an output leaf cannot complete early.
    out = f(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    out = f(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0])
    return time.perf_counter() - t0


def main():
    cfg = LlamaConfig(max_seq=2048)
    params = build_quant_params(cfg, jax.random.PRNGKey(0))
    params = jax.block_until_ready(params)
    qls = [layer[k] for layer in params["layers"]
           for k in ("wqkv", "wo", "w_gateup", "w_down")]
    wbytes = sum(int(q.qweight.size) + 4 * int(q.scales.size) for q in qls)
    print(f"weight bytes: {wbytes/1e9:.2f} GB", flush=True)

    # 1. decode scan scaling
    cache = init_kv_cache(cfg, 1)
    tok = jnp.zeros((1,), jnp.int32)
    pos = jnp.full((1,), 1024, jnp.int32)
    times = {}
    for n in (4, 32):
        f = jax.jit(lambda p, t, ps, c, n=n: llama_decode_multi(
            p, cfg, t, ps, c, n)[0])
        times[n] = timed(f, params, tok, pos, cache)
        print(f"decode scan n={n}: {times[n]*1e3:.2f} ms", flush=True)
    per_step = (times[32] - times[4]) / 28
    print(f"decode per-step (diff): {per_step*1e3:.3f} ms -> "
          f"implied stream {wbytes/per_step/1e12:.2f} TB/s", flush=True)

    # 2. pallas matmul-chain scaling
    dins = {int(q.qweight.shape[0]) for q in qls}
    xs = {d: jnp.ones((1, d), jnp.bfloat16) for d in dins}

    def sweep(seed, qs, n):
        def body(i, acc):
            a = acc
            for q in qs:
                x = xs[int(q.qweight.shape[0])] + a.astype(jnp.bfloat16)
                a = jnp.mean(wo_matmul(x, q)).astype(jnp.float32) * 1e-30
            return a
        return jax.lax.fori_loop(0, n, body, seed)

    times = {}
    for n in (1, 5):
        f = jax.jit(lambda s, qs, n=n: sweep(s, qs, n))
        times[n] = timed(f, jnp.float32(1e-30), qls)
        print(f"pallas chain n={n}: {times[n]*1e3:.2f} ms", flush=True)
    per = (times[5] - times[1]) / 4
    print(f"pallas sweep (diff): {per*1e3:.3f} ms -> "
          f"{wbytes/per/1e12:.2f} TB/s", flush=True)

    # 3. raw int8 reduce sweep
    def red(seed, qws, n):
        def body(i, acc):
            m = (acc & jnp.int32(127)).astype(jnp.int8)
            return acc + sum(jnp.sum(q ^ m, dtype=jnp.int32) for q in qws)
        return jax.lax.fori_loop(0, n, body, seed)

    times = {}
    for n in (1, 5):
        f = jax.jit(lambda s, qws, n=n: red(s, qws, n))
        times[n] = timed(f, jnp.int32(1), [q.qweight for q in qls])
        print(f"xor reduce n={n}: {times[n]*1e3:.2f} ms", flush=True)
    per = (times[5] - times[1]) / 4
    print(f"xor sweep (diff): {per*1e3:.3f} ms -> "
          f"{wbytes/per/1e12:.2f} TB/s", flush=True)


if __name__ == "__main__":
    main()
