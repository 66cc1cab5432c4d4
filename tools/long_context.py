"""Long-context performance artifact (round-4 verdict item 5).

Single chip, 7B INT4 geometry, decode at depth: for ctx in {4k, 8k, 16k}
measure the fused decode step with the cache SIZED TO THE WORKLOAD
(max_seq = ctx) and the decode position at depth (pos = ctx - 64), in
four cache modes:

  bf16        contiguous bf16 KV + flash_decode
  int8        contiguous INT8 KV (+f32 scale planes) + flash_decode_q8
  attn-only   the attention kernel alone at depth (chained) -> the
              attention-class GB/s vs live KV bytes at each length
  paged       paged_flash_decode(_q8) at the same depth (page 256)

This answers three round-4 claims that had no evidence:
  * where INT8-KV crosses over bf16 (round-4: GPT-2 at S<=384 int8-KV
    was SLOWER; the claim was "knob kept for long context"),
  * what the flash whole-S VMEM fallback does past S=8192
    (kernels/attention.py _pick_seq_block: S>8192 falls back to the
    largest 128-multiple divisor),
  * attention-class GB/s at depth (DECODE_BUDGET only measured S=1024).

Memory discipline: stages ordered smallest-first, biggest (16k bf16)
LAST in the device claim (CLAUDE.md round-4 lesson: an OOM poisons every
later stage). Caches freed between stages.

Ring/Ulysses SP prefill evidence is a separate CPU-mesh run:
  LONGCTX_MODE=sp  env -u PYTHONPATH ... JAX_PLATFORMS=cpu \
      XLA_FLAGS=--xla_force_host_platform_device_count=8
merges its rows into the same artifact.

Writes docs/LONG_CONTEXT.json.
Run: python tools/long_context.py          (real TPU)
     LONGCTX_SMALL=1 for a CPU smoke of the harness.
"""

import functools
import gc
import json
import os
import sys
import threading
import time

os.environ.setdefault("JAX_PLATFORMS", "axon,tpu,cpu")
_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
print = functools.partial(print, flush=True)

OUT = os.path.join(_ROOT, "docs", "LONG_CONTEXT.json")


def load_results() -> dict:
    try:
        with open(OUT) as f:
            return json.load(f)
    except Exception:
        return {"metric": "long-context decode evidence", "rows": {}}


RESULTS = load_results()


def emit(key, data):
    RESULTS.setdefault("rows", {})[key] = data
    print(f"# {key}: {json.dumps(data)}")
    with open(OUT, "w") as f:
        json.dump(RESULTS, f, indent=1)


def chained_step_ms(step_fn, carry_init, big=(), n_lo=1, n_hi=7,
                    reps=3, k_inner=1):
    """step_fn(carry, *big) -> carry with a fetchable leaf; fori-chained
    two-point timing in ONE executable. `big` holds the large invariant
    operands (params, caches) which MUST enter as jit ARGUMENTS —
    closure-captured multi-GB arrays become HLO constants and stall the
    remote compiler (round-4 lesson, memory: jit-closure-constants)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    def f(n, carry, *big_):
        def trip(i, c):
            for _ in range(k_inner):
                c = step_fn(c, *big_)
            return c
        return jax.lax.fori_loop(0, n, trip, carry)

    jf = jax.jit(f)
    out = jf(jnp.int32(1), carry_init, *big)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:4])  # compile

    def run_n(n):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            o = jf(jnp.int32(n), carry_init, *big)
            np.asarray(jax.tree_util.tree_leaves(o)[0].ravel()[:4])
            best = min(best, time.perf_counter() - t0)
        return best

    return 1e3 * (run_n(n_hi) - run_n(n_lo)) / ((n_hi - n_lo) * k_inner)


def decode_row(params, cfg, ctx: int, kv_quant: bool, batch: int = 1):
    """Fused decode step at depth: cache sized to ctx, pos = ctx - 64."""
    import jax.numpy as jnp
    from infinitensor_tpu.models.llama import (
        init_kv_cache, llama_decode_step)

    import jax
    import numpy as np
    tok = jnp.zeros((batch,), jnp.int32)
    pos = jnp.full((batch,), ctx - 64, jnp.int32)

    # the cache is DONATED (at 16k int8 it is 4.3 GB; without donation
    # XLA holds input + output copies and the 8k-bf16/16k rows OOM) —
    # so it is re-created per timed run
    def f(n, p_, t, ps, c):
        def body(i, carry):
            t_, p2, c_ = carry
            logits, c_ = llama_decode_step(p_, cfg, t_, p2, c_)
            nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            # hold depth: re-decode around ctx-64 so every trip reads
            # the same live prefix
            return (nxt, p2, c_)
        t_, _, c = jax.lax.fori_loop(0, n, body, (t, ps, c))
        return t_, c

    jf = jax.jit(f, donate_argnums=(4,))

    def run_n(n, reps=3):
        best = float("inf")
        for _ in range(reps):
            cache = init_kv_cache(cfg, batch, max_seq=ctx,
                                  kv_quant=kv_quant)
            cache = jax.block_until_ready(cache)
            t0 = time.perf_counter()
            o, c2 = jf(jnp.int32(n), params, tok, pos, cache)
            np.asarray(o)
            best = min(best, time.perf_counter() - t0)
            del c2
            gc.collect()
        return best

    run_n(1, reps=1)                      # compile
    ms = 1e3 * (run_n(7) - run_n(1)) / 6
    gc.collect()
    kv_bytes_live = (cfg.n_layers * 2 * batch * cfg.n_kv_heads
                     * (ctx - 64) * cfg.head_dim
                     * (1 if kv_quant else 2))
    return {"step_ms": round(ms, 3), "tok_s": round(batch * 1e3 / ms, 1),
            "live_kv_gb": round(kv_bytes_live / 1e9, 3)}


def attn_row(cfg, ctx: int, kv_quant: bool, batch: int = 1):
    """Attention kernel alone at depth -> attention-class GB/s."""
    import jax
    import jax.numpy as jnp
    from infinitensor_tpu.kernels.attention import (
        flash_decode, flash_decode_q8)

    B, H, Hkv, D = batch, cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (B, H, 1, D), jnp.bfloat16)
    pos = jnp.full((B,), ctx - 64, jnp.int32)
    if kv_quant:
        kc = jax.random.randint(key, (B, Hkv, ctx, D), -127, 127, jnp.int8)
        vc = jax.random.randint(key, (B, Hkv, ctx, D), -127, 127, jnp.int8)
        ks = jax.random.uniform(key, (B, Hkv, ctx), jnp.float32, 0.001,
                                0.02)
        vs = jax.random.uniform(key, (B, Hkv, ctx), jnp.float32, 0.001,
                                0.02)

        def step(carry, kc_, vc_, ks_, vs_):
            qq, acc = carry
            o = flash_decode_q8(qq, kc_, vc_, ks_, vs_, pos)
            return (qq + (acc * 1e-30).astype(qq.dtype),
                    jnp.sum(o[..., :4]).astype(jnp.float32))
        bytes_live = 2 * B * Hkv * (ctx - 64) * D
        big = (kc, vc, ks, vs)
    else:
        kc = jax.random.normal(key, (B, Hkv, ctx, D), jnp.bfloat16)
        vc = jax.random.normal(key, (B, Hkv, ctx, D), jnp.bfloat16)

        def step(carry, kc_, vc_):
            qq, acc = carry
            o = flash_decode(qq, kc_, vc_, pos)
            return (qq + (acc * 1e-30).astype(qq.dtype),
                    jnp.sum(o[..., :4]).astype(jnp.float32))
        bytes_live = 2 * B * Hkv * (ctx - 64) * D * 2
        big = (kc, vc)

    ms = chained_step_ms(step, (q, jnp.float32(0)), big=big, n_hi=9,
                         k_inner=32)
    del kc, vc
    gc.collect()
    return {"ms": round(ms, 3),
            "gbps_vs_live": round(bytes_live / (ms / 1e3) / 1e9, 1)}


def paged_row(cfg, ctx: int, kv_quant: bool, batch: int = 1,
              page: int = 256):
    import jax
    import jax.numpy as jnp
    from infinitensor_tpu.kernels.paged_attention import (
        paged_flash_decode, paged_flash_decode_q8)

    B, H, Hkv, D = batch, cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
    n_pages = B * (ctx // page)
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (B, H, 1, D), jnp.bfloat16)
    pos = jnp.full((B,), ctx - 64, jnp.int32)
    table = jnp.arange(n_pages, dtype=jnp.int32).reshape(B, ctx // page)
    if kv_quant:
        kp = jax.random.randint(key, (n_pages, Hkv, page, D), -127, 127,
                                jnp.int8)
        vp = jax.random.randint(key, (n_pages, Hkv, page, D), -127, 127,
                                jnp.int8)
        ksp = jax.random.uniform(key, (n_pages, Hkv, page), jnp.float32,
                                 0.001, 0.02)
        vsp = jax.random.uniform(key, (n_pages, Hkv, page), jnp.float32,
                                 0.001, 0.02)

        def step(carry, kp_, vp_, ksp_, vsp_):
            qq, acc = carry
            o = paged_flash_decode_q8(qq, kp_, vp_, ksp_, vsp_, table,
                                      pos)
            return (qq + (acc * 1e-30).astype(qq.dtype),
                    jnp.sum(o[..., :4]).astype(jnp.float32))
        big = (kp, vp, ksp, vsp)
    else:
        kp = jax.random.normal(key, (n_pages, Hkv, page, D), jnp.bfloat16)
        vp = jax.random.normal(key, (n_pages, Hkv, page, D), jnp.bfloat16)

        def step(carry, kp_, vp_):
            qq, acc = carry
            o = paged_flash_decode(qq, kp_, vp_, table, pos)
            return (qq + (acc * 1e-30).astype(qq.dtype),
                    jnp.sum(o[..., :4]).astype(jnp.float32))
        big = (kp, vp)

    ms = chained_step_ms(step, (q, jnp.float32(0)), big=big, n_hi=9,
                         k_inner=32)
    del kp, vp
    gc.collect()
    return {"ms": round(ms, 3), "page": page}


def sp_section():
    """Ring-attention prefill at 8k on the virtual 8-device CPU mesh vs
    single-device flash prefill: compile+interpret timing — a SCALING
    SHAPE data point, not absolute TPU perf (stated caveat)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from infinitensor_tpu.parallel.mesh import make_mesh
    from infinitensor_tpu.parallel.sequence import ring_attention
    from infinitensor_tpu.kernels.flash_attention import mha_ref

    S, H, D = 8192, 8, 64
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (1, H, S, D), jnp.float32)
    k = jax.random.normal(key, (1, H, S, D), jnp.float32)
    v = jax.random.normal(key, (1, H, S, D), jnp.float32)

    mesh = make_mesh({"sp": 8}, jax.devices()[:8])
    t0 = time.perf_counter()
    out = ring_attention(q, k, v, mesh, axis_name="sp", causal=True)
    np.asarray(out)
    ring_first = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = ring_attention(q, k, v, mesh, axis_name="sp", causal=True)
    out_np = np.asarray(out)
    ring_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    ref = mha_ref(q, k, v, causal=True)
    ref_np = np.asarray(ref)
    ref_s = time.perf_counter() - t0

    err = float(np.max(np.abs(out_np - ref_np))
                / (np.max(np.abs(ref_np)) + 1e-9))
    emit("sp.ring_prefill_8k", {
        "ring_8dev_s": round(ring_s, 3),
        "single_dev_ref_s": round(ref_s, 3),
        "compile_s": round(ring_first - ring_s, 3),
        "max_rel_err": round(err, 6),
        "caveat": "virtual CPU mesh (xla_force_host_platform_device_"
                  "count): shows the SP program compiles, runs, and "
                  "matches numerically; absolute times are CPU, not TPU",
    })


def main():
    def heartbeat():
        n = 0
        while True:
            time.sleep(120)
            n += 1
            print(f"# heartbeat {n}")

    if os.environ.get("LONGCTX_MODE") == "sp":
        sp_section()
        return

    import jax
    import jax.numpy as jnp
    import numpy as np
    from infinitensor_tpu.models.llama import LlamaConfig
    from bench import build_quant_params

    dev = jax.devices()[0]
    np.asarray(jnp.zeros((1,)))
    print(f"# device ready: {getattr(dev, 'device_kind', dev.platform)}")
    threading.Thread(target=heartbeat, daemon=True).start()

    small = os.environ.get("LONGCTX_SMALL")
    if small:
        cfg = LlamaConfig(vocab_size=2048, dim=512, n_layers=4,
                          n_heads=8, n_kv_heads=8, intermediate=1376,
                          max_seq=1024)
        ctxs = [512, 1024]
    else:
        ctxs = [int(c) for c in os.environ.get(
            "LONGCTX_CTXS", "4096,8192,16384").split(",")]
        cfg = LlamaConfig(max_seq=max(ctxs))
    params = build_quant_params(cfg, jax.random.PRNGKey(0))
    np.asarray(jax.tree_util.tree_leaves(params)[-1].ravel()[:4])
    print("# params built")

    # attention-only and paged rows first (small allocations), decode
    # rows (full cache) after, int8 before bf16, shortest ctx first —
    # the 16k bf16 full-model row is the OOM-riskiest and runs LAST
    for ctx in ctxs:
        for kv in (True, False):
            tag = "int8" if kv else "bf16"
            emit(f"attn:{ctx}:{tag}", attn_row(cfg, ctx, kv))
    for ctx in ctxs:
        for kv in (True, False):
            tag = "int8" if kv else "bf16"
            try:
                emit(f"paged:{ctx}:{tag}", paged_row(cfg, ctx, kv))
            except Exception as e:  # noqa: BLE001
                emit(f"paged:{ctx}:{tag}", {"error": repr(e)[:500]})
    for ctx in ctxs:
        for kv in (True, False):
            tag = "int8" if kv else "bf16"
            try:
                emit(f"decode:{ctx}:{tag}",
                     decode_row(params, cfg, ctx, kv))
            except Exception as e:  # noqa: BLE001
                emit(f"decode:{ctx}:{tag}", {"error": repr(e)[:500]})

    # crossover statement
    rows = RESULTS.get("rows", {})
    cross = {}
    for ctx in ctxs:
        a = rows.get(f"decode:{ctx}:int8", {}).get("step_ms")
        b = rows.get(f"decode:{ctx}:bf16", {}).get("step_ms")
        if a and b:
            cross[str(ctx)] = {"int8_over_bf16": round(a / b, 3),
                               "int8_wins": a < b}
    RESULTS["int8_kv_crossover"] = cross
    with open(OUT, "w") as f:
        json.dump(RESULTS, f, indent=1)
    print(json.dumps({"metric": "long context", "rows": len(rows)}))


if __name__ == "__main__":
    if (os.environ.get("BENCH_WATCHDOG", "1") == "1"
            and not os.environ.get("BENCH_CHILD")
            and os.environ.get("LONGCTX_MODE") != "sp"):
        from infinitensor_tpu.utils.watchdog import babysit
        sys.exit(babysit(
            [sys.executable, os.path.abspath(__file__)],
            quiet_s=600.0, gap_s=420.0, attempts=2,
            env=dict(os.environ, BENCH_CHILD="1")))
    main()
