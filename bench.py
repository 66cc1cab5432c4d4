"""Headline benchmark: Llama-2-7B INT4 weight-only + INT8 KV-cache decode on
one TPU chip (the BASELINE flagship config).

Prints the headline JSON line LAST: {"metric", "value", "unit",
"vs_baseline", ...extras}; when BENCH_SERVING=1 (default) a GPT-2 345M INT8
continuous-batching serving line (BASELINE config 3) is printed first.
vs_baseline = measured tokens/sec divided by the HBM-bandwidth roofline for
weight-only decode on this chip (the reference publishes no absolute
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

    bits = int(os.environ.get("BENCH_BITS", "4"))

    # int4 scales ride in bf16: measured 6.4% faster wqkv pass + half
    # the scale bytes (docs/DECODE_BUDGET.json wqkv_bf16_scales); the
    # trained accuracy gate covers bf16-scale quantization
    sdt = jnp.bfloat16 if bits == 4 else jnp.float32

    def qlin_stack(k, din, dout, bits=bits, group=128, pad_to=0):
        while din % group:
            group //= 2
        kq, ks = jax.random.split(k)
        logical = 0
        logical_dout = dout
        if pad_to and dout % pad_to:
            # tile-friendly physical columns (quant/weight_only.py
            # out_logical): 22016 has no 128-multiple divisor above 512
            logical, dout = dout, dout + pad_to - dout % pad_to
        q = jax.random.randint(kq, (L, din if bits == 8 else din // 2, dout),
                               -127, 127, jnp.int8)
        # tuned 'slab' variant implies PAIRED scale groups (one scale row
        # per split-half pair; kernels/quant_matmul._group_dots_slab) —
        # the real quantizer path is quantize_weight(paired=True)
        from infinitensor_tpu.kernels.quant_matmul import _tuned
        tuned = _tuned(din, logical_dout, bits) or {}
        ng = din // (2 * group) if (bits == 4 and
                                    tuned.get("variant") == "slab") \
            else din // group
        scales = jax.random.uniform(ks, (L, ng, dout), jnp.float32,
                                    0.001, 0.02).astype(sdt)
        return [QuantizedLinear(q[i], scales[i], bits, group, logical)
                for i in range(L)]

    wqkv = qlin_stack(k1, cfg.dim, cfg.dim + 2 * kvd)
    wo = qlin_stack(k2, cfg.dim, cfg.dim)
    wgu = qlin_stack(k3, cfg.dim, 2 * cfg.intermediate,
                     pad_to=2048)
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
                                    0.001, 0.02).astype(sdt)
        return QuantizedLinear(q, scales, bits, group)

    return {
        "embed": embed,
        "final_norm": jnp.ones((cfg.dim,), cfg.dtype),
        "lm_head": qlin(k6, cfg.dim, cfg.vocab_size),
        "layers": layers,
    }


def measure_hbm_bw(params, cfg, batch: int) -> float:
    """Calibrate the achievable weight-streaming rate on this chip by timing
    the dequant-matmul kernel itself over the model's own quantized weights,
    at the decode activation shape. This is the honest roofline denominator:
    a decode step is this weight stream PLUS attention/norms/collectives, so
    decode tok/s / (stream rate / bytes-per-token) <= 1 by construction.
    (Measured with host-fetch timing this chip streams ~0.55-0.71 TB/s,
    consistent with its v5e label; see tools/bw_diag.py for the
    methodology.) N chained sweeps run inside ONE executable — per-launch
    dispatch through the tunnel would otherwise dominate — with a scalar
    data dependence threaded through every matmul so XLA cannot hoist,
    CSE, or dead-code any of the weight reads."""
    import time
    import jax
    import jax.numpy as jnp
    from infinitensor_tpu.quant.weight_only import wo_matmul

    qls = [layer[k] for layer in params["layers"]
           for k in ("wqkv", "wo", "w_gateup", "w_down")]
    qls.append(params["lm_head"])
    total = sum(int(q.qweight.size)
                + int(q.scales.size) * q.scales.dtype.itemsize
                for q in qls)
    dins = {int(q.qweight.shape[0]) * (2 if q.bits == 4 else 1) for q in qls}
    xs = {d: jnp.ones((batch, d), jnp.bfloat16) for d in dins}

    def sweep(seed, params_, n):
        layers = params_["layers"]
        qs = [layer[k] for layer in layers
              for k in ("wqkv", "wo", "w_gateup", "w_down")]
        qs.append(params_["lm_head"])

        def body(i, acc):
            a = acc
            for q in qs:
                din = int(q.qweight.shape[0]) * (2 if q.bits == 4 else 1)
                x = xs[din] + a.astype(jnp.bfloat16)
                out = wo_matmul(x, q)
                a = jnp.mean(out).astype(jnp.float32) * 1e-30
            return a
        return jax.lax.fori_loop(0, n, body, seed)

    # Timing MUST end with a host fetch (np.asarray), not
    # block_until_ready: on the experimental axon platform
    # block_until_ready can return before execution finishes, which
    # produced physically impossible tok/s readings (>100 TB/s implied
    # weight stream). Two-point method (n=1 vs n=5) subtracts the ~25-30 ms
    # per-launch tunnel round-trip, which would otherwise deflate the
    # measured stream rate by ~40%.
    import numpy as np

    # ONE executable with a runtime trip count (a per-n jit would compile
    # twice), and a LONG high point: with n_hi=13 the two-point diff is
    # ~12 passes (~65 ms of signal) — a 4-pass diff read 194.9 GB/s on a
    # jittery tunnel window while the same session's kernels streamed
    # 440-570 (docs/DECODE_BUDGET.json), an incoherent roofline.
    f = jax.jit(lambda s, n, p: jax.lax.fori_loop(
        0, n, lambda i, a: sweep(a, p, 1), s))
    np.asarray(f(jnp.float32(0), jnp.int32(1), params))

    def run_n(n):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(f(jnp.float32(1e-30), jnp.int32(n), params))
            best = min(best, time.perf_counter() - t0)
        return best

    dt = (run_n(13) - run_n(1)) / 12
    return total / dt  # bytes/s


def measure_chip_peak_bw(params) -> float:
    """INDEPENDENT chip-peak stream rate (round-4 verdict item 1): time a
    pure reduction over the model's quantized weight buffers — no dequant,
    no matmul, just reads — so the denominator cannot inherit any
    dequant-kernel inefficiency. XLA lowers the int8 sum to a straight
    HBM-bound stream; the same chained two-point / runtime-trip-count /
    min-of-3 / host-fetch discipline as measure_hbm_bw."""
    import time
    import jax
    import jax.numpy as jnp
    import numpy as np

    qls = [layer[k] for layer in params["layers"]
           for k in ("wqkv", "wo", "w_gateup", "w_down")]
    qls.append(params["lm_head"])
    total = sum(int(q.qweight.size)
                + int(q.scales.size) * q.scales.dtype.itemsize
                for q in qls)

    def sweep(seed, params_, n):
        layers = params_["layers"]
        qs = [layer[k] for layer in layers
              for k in ("wqkv", "wo", "w_gateup", "w_down")]
        qs.append(params_["lm_head"])

        def body(i, acc):
            a = acc
            for q in qs:
                # nonlinear (abs) use of the carried value: XLA cannot
                # reassociate sum(|w + a|) into a hoistable sum(w), so
                # every trip re-reads every buffer
                s = jnp.sum(jnp.abs(q.qweight + a.astype(jnp.int8)
                                    ).astype(jnp.int32))
                s = s + jnp.sum(jnp.abs(
                    q.scales.astype(jnp.float32)
                    + a.astype(jnp.float32))).astype(jnp.int32)
                a = (s % 3).astype(jnp.int32)
            return a % 2
        return jax.lax.fori_loop(0, n, body, seed)

    f = jax.jit(lambda s, n, p: sweep(s, p, n))
    np.asarray(f(jnp.int32(0), jnp.int32(1), params))

    def run_n(n):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(f(jnp.int32(0), jnp.int32(n), params))
            best = min(best, time.perf_counter() - t0)
        return best

    dt = (run_n(13) - run_n(1)) / 12
    return total / dt  # bytes/s


def weight_bytes_per_token(cfg, bits=8, group=128):
    kvd = cfg.n_kv_heads * cfg.head_dim
    per_layer = (cfg.dim * cfg.dim * 2 + cfg.dim * kvd * 2
                 + cfg.dim * cfg.intermediate * 3)
    total = per_layer * cfg.n_layers + cfg.dim * cfg.vocab_size
    # weight stream + per-group scales (bf16 at int4, f32 at int8 — same
    # accounting as the measure_hbm_bw calibrator, which reads them too)
    scale_bytes = 2 if bits == 4 else 4
    return total * bits / 8 + total / group * scale_bytes


def run_serving_bench():
    """Emit the BASELINE 'GPT-2 345M INT8 continuous batching' line
    (tools/serving_bench.py) before the headline; failures must never
    sink the headline measurement."""
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "tools"))
    import serving_bench
    for attempt in (1, 2):
        try:
            serving_bench.main()
            return
        except Exception as e:  # noqa: BLE001
            # remote-compile hiccups ("response body closed...") are
            # transient; one in-process retry (same tunnel claim)
            # recovers them without risking the headline
            print(json.dumps({
                "metric": "gpt2-345m int8 continuous batching tokens/s",
                "attempt": attempt, "error": repr(e)[:300]}),
                file=sys.stderr, flush=True)
            if attempt == 2:
                return
            time.sleep(30)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from infinitensor_tpu.models.llama import (
        LlamaConfig, init_kv_cache, llama_decode_step)

    # claim the device up front and say so — these heartbeats are what the
    # watchdog parent distinguishes a wedged tunnel by
    dev0 = jax.devices()[0]
    np.asarray(jnp.zeros((1,)))
    print(f"# device ready: {getattr(dev0, 'device_kind', dev0.platform)}",
          file=sys.stderr, flush=True)

    if (os.environ.get("BENCH_SERVING", "1") == "1"
            and not os.environ.get("BENCH_SMALL")):
        run_serving_bench()

    batch = int(os.environ.get("BENCH_BATCH", "1"))
    seq_ctx = int(os.environ.get("BENCH_CTX", "1024"))
    steps = int(os.environ.get("BENCH_STEPS", "32"))
    # Cache capacity = declared workload (ctx + decoded steps, padded to
    # 128), not a fixed 2048: the flash kernel reads the whole static
    # cache per step (seq_block covers it), so dead padding rows are pure
    # HBM waste — 0.42 ms/step at ctx=1024 in a 2048 cache
    # (docs/DECODE_BUDGET.json). Serving sizes caches the same way
    # (prefill buckets / paged pools); BENCH_MAXSEQ overrides.
    multi_env = int(os.environ.get("BENCH_MULTI", "128"))
    need = seq_ctx + max(steps, multi_env * max(
        4, steps // max(multi_env, 1))) + 2
    max_seq = int(os.environ.get("BENCH_MAXSEQ",
                                 (need + 127) // 128 * 128))
    cfg = LlamaConfig(max_seq=max_seq)  # llama-2-7b geometry
    if os.environ.get("BENCH_SMALL"):
        cfg = LlamaConfig(vocab_size=2048, dim=512, n_layers=4, n_heads=8,
                          n_kv_heads=8, intermediate=1376, max_seq=256)
        seq_ctx = min(seq_ctx, 128)

    kv_quant = os.environ.get("BENCH_KV", "int8") == "int8"
    dev = jax.devices()[0]
    t0 = time.time()
    params = build_quant_params(cfg, jax.random.PRNGKey(0))
    cache = init_kv_cache(cfg, batch, kv_quant=kv_quant)
    params, cache = jax.block_until_ready((params, cache))
    build_s = time.time() - t0
    print(f"# llama params built in {build_s:.1f}s", file=sys.stderr,
          flush=True)

    token = jnp.zeros((batch,), jnp.int32)
    pos = jnp.full((batch,), seq_ctx, jnp.int32)

    # multi-step fused decode: N autoregressive steps per executable launch
    # (amortizes per-launch dispatch; real greedy decode, not replay)
    # Timing protocol: warmup ends and the timed region ends with a HOST
    # FETCH (np.asarray) of a compute-dependent output. block_until_ready
    # on the experimental axon platform can return early, which previously
    # yielded impossible readings (implied >100 TB/s weight streaming).
    # The fetched array is tiny (the generated tokens), and the serial
    # dependence through the donated KV cache means fetching the LAST
    # launch's tokens transitively waits for every step.
    import numpy as np
    multi = int(os.environ.get("BENCH_MULTI", "128"))
    if multi > 1:
        from infinitensor_tpu.models.llama import llama_decode_multi
        step = jax.jit(
            lambda p, t, ps, c: llama_decode_multi(p, cfg, t, ps, c, multi),
            donate_argnums=(3,))
        t0 = time.time()
        toks, token, pos, cache = step(params, token, pos, cache)
        np.asarray(toks)
        compile_s = time.time() - t0
        print(f"# compiled in {compile_s:.1f}s", file=sys.stderr,
              flush=True)
        outer = max(4, steps // multi)
        # variance discipline (round-2 verdict): repeat the whole timed
        # region in-process with FRESH state (cache re-init, pos reset to
        # ctx so every rep measures the same fill range); launches within
        # a region stay async and it ends with a host fetch. min-of-3 is
        # the established measurement protocol (CLAUDE.md) — the tuner
        # sessions use it; 2 reps left the headline exposed to a single
        # slow region (tunnel jitter runs ~2-4% between regions)
        reps = int(os.environ.get("BENCH_REPS", "3"))
        samples = []
        for r in range(max(1, reps)):
            # fresh state every rep (incl. after the warmup launch)
            cache = init_kv_cache(cfg, batch, kv_quant=kv_quant)
            cache = jax.block_until_ready(cache)
            token = jnp.zeros((batch,), jnp.int32)
            pos = jnp.full((batch,), seq_ctx, jnp.int32)
            t0 = time.time()
            for i in range(outer):
                toks, token, pos, cache = step(params, token, pos, cache)
            np.asarray(toks)
            samples.append(time.time() - t0)
            print(f"# decode region: {samples[-1]:.3f}s", file=sys.stderr,
                  flush=True)
        dt = min(samples)
        steps = outer * multi
    else:
        step = jax.jit(
            lambda p, t, ps, c: llama_decode_step(p, cfg, t, ps, c),
            donate_argnums=(3,))
        t0 = time.time()
        logits, cache = step(params, token, pos, cache)
        np.asarray(logits[:, :8])
        compile_s = time.time() - t0
        t0 = time.time()
        for i in range(steps):
            logits, cache = step(params, token, pos, cache)
        np.asarray(logits[:, :8])
        dt = time.time() - t0
        samples = [dt]
    tok_s = batch * steps / dt

    # roofline: weight stream + kv-cache read per decoded token
    if os.environ.get("BENCH_HBM_GBPS"):
        hbm_gbps = float(os.environ["BENCH_HBM_GBPS"])
    else:
        hbm_gbps = measure_hbm_bw(params, cfg, batch) / 1e9
    if os.environ.get("BENCH_CHIP_GBPS"):
        chip_gbps = float(os.environ["BENCH_CHIP_GBPS"])
    else:
        try:
            chip_gbps = measure_chip_peak_bw(params) / 1e9
        except Exception as e:  # noqa: BLE001 — never sink the headline
            print(f"# chip-peak calibration failed: {e!r}",
                  file=sys.stderr, flush=True)
            chip_gbps = None
    if kv_quant:
        # int8 rows + per-row f32 scale (K and V)
        kv_bytes = (2 * cfg.n_layers * cfg.n_kv_heads * seq_ctx
                    * (cfg.head_dim + 4))
    else:
        kv_bytes = (2 * cfg.n_layers * cfg.n_kv_heads * seq_ctx
                    * cfg.head_dim * 2)  # bf16 cache read
    bits = int(os.environ.get("BENCH_BITS", "4"))
    bytes_per_tok = weight_bytes_per_token(cfg, bits) / batch + kv_bytes
    roofline = hbm_gbps * 1e9 / bytes_per_tok

    chip_roofline = (chip_gbps * 1e9 / bytes_per_tok
                     if chip_gbps else None)

    kv_tag = "+kv8" if kv_quant else ""
    result = {
        "metric": f"llama2-7b int{bits}{kv_tag} decode tokens/sec/chip "
                  f"(bs={batch}, ctx={seq_ctx})",
        "value": round(tok_s, 2),
        "unit": "tokens/s",
        "vs_baseline": round(tok_s / (roofline * batch), 4),
        "roofline_tokens_s": round(roofline * batch, 1),
        "per_token_ms": round(1e3 * dt / steps, 3),
        "tok_s_samples": [round(batch * steps / s, 2)
                          for s in samples] if multi > 1 else None,
        "spread_pct": round(100.0 * (max(samples) - min(samples))
                            / max(samples), 1) if multi > 1 else None,
        "compile_s": round(compile_s, 1),
        "build_s": round(build_s, 1),
        "hbm_gbps_measured": round(hbm_gbps, 1),
        # dual roofline (round-4 verdict): vs_chip_peak scores against an
        # INDEPENDENT pure-stream measurement of the same buffers, so
        # dequant-kernel inefficiency cannot hide in the denominator
        "chip_peak_gbps_measured":
            round(chip_gbps, 1) if chip_gbps else None,
        "vs_chip_peak": round(tok_s / (chip_roofline * batch), 4)
            if chip_roofline else None,
        "chip_roofline_tokens_s": round(chip_roofline * batch, 1)
            if chip_roofline else None,
        "multi_step": int(os.environ.get("BENCH_MULTI", "128")),
        "device": str(dev),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    if (os.environ.get("BENCH_WATCHDOG", "1") == "1"
            and not os.environ.get("BENCH_CHILD")):
        # tunnel-wedge babysitter (utils/watchdog.py): heartbeat lines
        # above are what it distinguishes a wedged child by
        from infinitensor_tpu.utils.watchdog import babysit
        sys.exit(babysit(
            [sys.executable, os.path.abspath(__file__)],
            quiet_s=float(os.environ.get("BENCH_WATCHDOG_QUIET_S", "600")),
            gap_s=float(os.environ.get("BENCH_WATCHDOG_GAP_S", "420")),
            attempts=int(os.environ.get("BENCH_WATCHDOG_ATTEMPTS", "2")),
            env=dict(os.environ, BENCH_CHILD="1")))
    main()
