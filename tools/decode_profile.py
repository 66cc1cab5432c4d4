"""Component-wise on-chip budget of the 7B INT4+KV8 decode step.

Round-2 verdict: the flagship bench sustains ~452 GB/s effective while the
chip's calibrated stream rate reads ~500-660 GB/s — this tool finds the
missing bandwidth by timing each decode component standalone with the
repo's honest protocol (host-fetch-terminated regions, chained executions
inside ONE executable with a threaded data dependence, two-point
launch-overhead cancellation, min-of-3), and times the candidate fixes in
the same session: quant_matmul "group" vs "chunk" variants, bf16 scales,
flash_decode_q8 (seq_block x head_block) sweep.

Compile discipline: the iteration count is a RUNTIME argument to
lax.fori_loop, so each measurement compiles exactly ONE executable and
runs it at n_lo/n_hi — an early revision compiled per-(section, n) and
spent minutes per compile on the remote service. A heartbeat thread keeps
the tunnel watchdog fed through long compiles.

Writes docs/DECODE_BUDGET.json progressively.
"""

import json
import os
import sys
import threading
import time

os.environ.setdefault("JAX_PLATFORMS", "axon,tpu,cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RESULTS: dict = {}
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "docs", "DECODE_BUDGET.json")


def emit(section, data):
    RESULTS[section] = data
    print(f"# {section}: {json.dumps(data)}", flush=True)
    with open(OUT, "w") as f:
        json.dump(RESULTS, f, indent=1)


def main():
    def heartbeat():
        n = 0
        while True:
            time.sleep(120)
            n += 1
            print(f"# heartbeat {n}", flush=True)

    import jax
    import jax.numpy as jnp
    import numpy as np
    from bench import build_quant_params, measure_hbm_bw
    from infinitensor_tpu.models.llama import (
        LlamaConfig, init_kv_cache, llama_decode_multi)
    from infinitensor_tpu.kernels.quant_matmul import quant_matmul
    from infinitensor_tpu.kernels.attention import flash_decode_q8

    dev = jax.devices()[0]
    np.asarray(jnp.zeros((1,)))
    print(f"# device ready: {getattr(dev, 'device_kind', dev.platform)}",
          flush=True)
    # heartbeats AFTER the claim: during the claim, silence is the
    # watchdog's only wedge signal
    threading.Thread(target=heartbeat, daemon=True).start()

    cfg = LlamaConfig(max_seq=2048)
    if os.environ.get("PROFILE_SMALL"):
        cfg = LlamaConfig(vocab_size=2048, dim=512, n_layers=2, n_heads=4,
                          n_kv_heads=4, intermediate=1024, max_seq=256)
    t0 = time.time()
    params = build_quant_params(cfg, jax.random.PRNGKey(0))
    params = jax.block_until_ready(params)
    print(f"# params built in {time.time()-t0:.1f}s", flush=True)

    N_LO, N_HI = 1, 9

    def two_point(chain_of_n, tag, *data):
        """chain_of_n(seed, n, *data) runs n chained passes; ONE jit, two
        run points, min-of-3 each, per-pass seconds returned. Device
        arrays MUST come in via *data — a closure-captured device array
        becomes an HLO constant and the remote compile service chokes on
        multi-MB constants (learned the hard way: 10+ min compiles)."""
        f = jax.jit(chain_of_n)
        np.asarray(f(jnp.float32(0), jnp.int32(N_LO), *data))
        best = {}
        for n in (N_LO, N_HI):
            b = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                np.asarray(f(jnp.float32(1e-30), jnp.int32(n), *data))
                b = min(b, time.perf_counter() - t0)
            best[n] = b
        print(f"#   {tag}: t{N_LO}={best[N_LO]*1e3:.2f}ms "
              f"t{N_HI}={best[N_HI]*1e3:.2f}ms", flush=True)
        return (best[N_HI] - best[N_LO]) / (N_HI - N_LO)

    # ---- HBM calibration (same as bench: chunk-variant-free default) ----
    from bench import measure_chip_peak_bw
    hbm = measure_hbm_bw(params, cfg, 1)
    emit("hbm_calibration", {
        "gbps": round(hbm / 1e9, 1),
        "method": "bench.measure_hbm_bw: repo's own dequant kernels, "
                  "12-pass chained diff, min-of-3, host fetch"})
    try:
        # assumes the fused quantized layout (wqkv/w_gateup QuantizedLinear
        # leaves); a float or unfused-param run must not kill the whole
        # profile mid-TPU-session (bench.py guards the same call)
        chip = measure_chip_peak_bw(params)
        emit("chip_peak_stream", {
            "gbps": round(chip / 1e9, 1),
            "method": "bench.measure_chip_peak_bw: pure abs-sum reduction "
                      "over the same weight buffers (no dequant/matmul) — "
                      "the independent denominator of the dual roofline"})
    except Exception as e:   # noqa: BLE001 — diagnostic continues without it
        emit("chip_peak_stream", {"error": repr(e)[:200]})

    # ---- per-shape quant_matmul, both variants --------------------------
    kvd = cfg.n_kv_heads * cfg.head_dim
    shapes = {
        "wqkv": (cfg.dim, cfg.dim + 2 * kvd),
        "wo": (cfg.dim, cfg.dim),
        "w_gateup": (cfg.dim, 2 * cfg.intermediate),
        "w_down": (cfg.intermediate, cfg.dim),
    }
    mm = {}
    for name, (din, dout) in shapes.items():
        qls = [layer[name] for layer in params["layers"]]
        wbytes = sum(int(q.qweight.size) + int(q.scales.size)
                     * q.scales.dtype.itemsize for q in qls)
        x0 = jnp.ones((1, din), jnp.bfloat16)
        for variant in ("group", "chunk"):
            def chain(seed, n, qls, x0, variant=variant):
                def body(i, acc):
                    a = acc
                    for q in qls:
                        x = x0 + a.astype(jnp.bfloat16)
                        out = quant_matmul(x, q, variant=variant)
                        a = jnp.mean(out).astype(jnp.float32) * 1e-30
                    return a
                return jax.lax.fori_loop(0, n, body, seed)
            dt = two_point(chain, f"{name}:{variant}", qls, x0)
            mm[f"{name}:{variant}"] = {
                "ms_x32": round(dt * 1e3, 4),
                "gbps": round(wbytes / dt / 1e9, 1),
            }
            emit("quant_matmul", mm)
    lm = params["lm_head"]
    lm_bytes = int(lm.qweight.size) + int(lm.scales.size) \
        * lm.scales.dtype.itemsize
    x0 = jnp.ones((1, cfg.dim), jnp.bfloat16)
    for variant in ("group", "chunk"):
        def chain(seed, n, lm, x0, variant=variant):
            def body(i, acc):
                a = acc
                for _ in range(4):
                    x = x0 + a.astype(jnp.bfloat16)
                    out = quant_matmul(x, lm, variant=variant)
                    a = jnp.mean(out).astype(jnp.float32) * 1e-30
                return a
            return jax.lax.fori_loop(0, n, body, seed)
        dt = two_point(chain, f"lm_head:{variant}", lm, x0) / 4
        mm[f"lm_head:{variant}"] = {
            "ms_x1": round(dt * 1e3, 4),
            "gbps": round(lm_bytes / dt / 1e9, 1)}
        emit("quant_matmul", mm)

    # ---- bf16 scales (wqkv only, best variant) --------------------------
    from infinitensor_tpu.quant.weight_only import QuantizedLinear
    qls16 = [QuantizedLinear(l["wqkv"].qweight,
                             l["wqkv"].scales.astype(jnp.bfloat16),
                             l["wqkv"].bits, l["wqkv"].group_size)
             for l in params["layers"]]
    wbytes16 = sum(int(q.qweight.size) + int(q.scales.size) * 2
                   for q in qls16)
    x0 = jnp.ones((1, cfg.dim), jnp.bfloat16)

    def chain16(seed, n, qls16, x0):
        def body(i, acc):
            a = acc
            for q in qls16:
                x = x0 + a.astype(jnp.bfloat16)
                out = quant_matmul(x, q, variant="group")
                a = jnp.mean(out).astype(jnp.float32) * 1e-30
            return a
        return jax.lax.fori_loop(0, n, body, seed)
    dt = two_point(chain16, "wqkv:bf16scales", qls16, x0)
    emit("wqkv_bf16_scales", {"ms_x32": round(dt * 1e3, 4),
                              "gbps": round(wbytes16 / dt / 1e9, 1)})

    # ---- flash_decode_q8: (seq_block x head_block) at pos=1024 ----------
    B, Hkv, S, D = 1, cfg.n_kv_heads, cfg.max_seq, cfg.head_dim
    key = jax.random.PRNGKey(1)
    kc = [jax.random.randint(key, (B, Hkv, S, D), -127, 127, jnp.int8)
          for _ in range(cfg.n_layers)]
    vc = [jax.random.randint(key, (B, Hkv, S, D), -127, 127, jnp.int8)
          for _ in range(cfg.n_layers)]
    ks = [jnp.full((B, Hkv, S), 0.01, jnp.float32)
          for _ in range(cfg.n_layers)]
    vs = [jnp.full((B, Hkv, S), 0.01, jnp.float32)
          for _ in range(cfg.n_layers)]
    (kc, vc, ks, vs) = jax.block_until_ready((kc, vc, ks, vs))
    q0 = jnp.ones((B, cfg.n_heads, 1, D), jnp.bfloat16)
    pos_val = min(1024, S // 2)
    pos = jnp.full((B,), pos_val, jnp.int32)
    full_bytes = cfg.n_layers * 2 * Hkv * S * (D + 4)     # whole cache
    live_bytes = cfg.n_layers * 2 * Hkv * (pos_val + 1) * (D + 4)
    att = {}
    for blk, hb in ((2048, 1), (2048, 8), (512, 8), (512, 32), (256, 32)):
        def chain(seed, n, kc, vc, ks, vs, q0, pos, blk=blk, hb=hb):
            def body(i, acc):
                a = acc
                for l in range(cfg.n_layers):
                    q = q0 + a.astype(jnp.bfloat16)
                    out = flash_decode_q8(q, kc[l], vc[l], ks[l],
                                          vs[l], pos, seq_block=blk,
                                          head_block=hb)
                    a = jnp.mean(out).astype(jnp.float32) * 1e-30
                return a
            return jax.lax.fori_loop(0, n, body, seed)
        dt = two_point(chain, f"blk{blk}:hb{hb}", kc, vc, ks, vs, q0, pos)
        att[f"blk{blk}:hb{hb}"] = {
            "ms_x32": round(dt * 1e3, 4),
            "gbps_vs_full": round(full_bytes / dt / 1e9, 1),
            "gbps_vs_live": round(live_bytes / dt / 1e9, 1)}
        emit("flash_decode_q8_pos1024", att)

    # ---- full decode step (two-point over scan length) ------------------
    cache = init_kv_cache(cfg, 1, kv_quant=True)
    cache = jax.block_until_ready(cache)
    tok = jnp.zeros((1,), jnp.int32)
    p0 = jnp.full((1,), pos_val, jnp.int32)
    times = {}
    for n in (8, 40):
        f = jax.jit(lambda prm, t, ps, c, n=n: llama_decode_multi(
            prm, cfg, t, ps, c, n)[0])
        np.asarray(f(params, tok, p0, cache))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = f(params, tok, p0, cache)
            np.asarray(out)
            best = min(best, time.perf_counter() - t0)
        times[n] = best
        print(f"# decode scan n={n}: {best*1e3:.2f} ms", flush=True)
    per_step = (times[40] - times[8]) / 32
    launch_ms = (times[8] - 8 * per_step) * 1e3
    emit("decode_step", {
        "per_step_ms": round(per_step * 1e3, 4),
        "launch_overhead_ms": round(launch_ms, 2),
        "tok_s": round(1.0 / per_step, 2)})

    # ---- budget reconciliation ------------------------------------------
    best_mm = {}
    for name in list(shapes) + ["lm_head"]:
        g = mm[f"{name}:group"]
        c = mm[f"{name}:chunk"]
        k = "ms_x32" if "ms_x32" in g else "ms_x1"
        best_mm[name] = min(g[k], c[k])
    att_best = min(v["ms_x32"] for v in att.values())
    accounted = sum(best_mm.values()) + att_best
    emit("budget", {
        "matmuls_ms": {k: round(v, 4) for k, v in best_mm.items()},
        "attention_ms": att_best,
        "accounted_ms": round(accounted, 4),
        "step_ms": round(per_step * 1e3, 4),
        "glue_ms": round(per_step * 1e3 - accounted, 4)})
    print(json.dumps({"metric": "decode budget", "done": True}))


if __name__ == "__main__":
    if (os.environ.get("BENCH_WATCHDOG", "1") == "1"
            and not os.environ.get("BENCH_CHILD")):
        from infinitensor_tpu.utils.watchdog import babysit
        sys.exit(babysit(
            [sys.executable, os.path.abspath(__file__)],
            quiet_s=600.0, gap_s=420.0, attempts=2,
            env=dict(os.environ, BENCH_CHILD="1")))
    main()
