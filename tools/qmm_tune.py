"""On-chip tuner for the dequant-matmul kernel (block_out x variant per
weight shape) — the reference's cublas 24-algo tune loop recast for the
TPU kernel (reference src/kernels/cuda/matmul.cc:25-187 + PerfEngine JSON
persistence, perf_engine.cc:7-22).

Sweeps each 7B decode shape over output-tile sizes and both dequant
variants with the honest chained two-point protocol, writes the winners
to docs/qmm_tune.json (read by kernels/quant_matmul.py at trace time),
then re-measures the full decode step and the HBM calibration with the
table active. Writes docs/QMM_TUNE_REPORT.json.
"""

import json
import os
import sys
import threading
import time

os.environ.setdefault("JAX_PLATFORMS", "axon,tpu,cpu")
_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

TABLE = os.path.join(_ROOT, "docs", "qmm_tune.json")
REPORT = os.path.join(_ROOT, "docs", "QMM_TUNE_REPORT.json")


def divisor_bns(dout: int, lo=128, hi=4096):
    out = []
    b = 128
    while b <= min(hi, dout):
        if dout % b == 0:
            out.append(b)
        b += 128
    return out


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
    from infinitensor_tpu.kernels import quant_matmul as qm

    np.asarray(jnp.zeros((1,)))
    print(f"# device ready: {jax.devices()[0]}", flush=True)
    threading.Thread(target=heartbeat, daemon=True).start()
    model = os.environ.get("QMM_MODEL", "llama7b")
    t0 = time.time()
    if model == "gpt2":
        # serving shapes: GPT-2 345M INT8 at the 16-slot batch. Small
        # douts make 1-8-step grids (no pipelining) — the sweep's 2D
        # (k-split) and w8a8 candidates matter most here.
        from infinitensor_tpu.models.gpt2 import (
            GPT2Config, init_gpt2_params, quantize_gpt2_params)
        cfg = GPT2Config(max_seq=int(os.environ.get("SERVE_MAXSEQ",
                                                    "384")))
        params = quantize_gpt2_params(
            init_gpt2_params(cfg, jax.random.PRNGKey(0)), bits=8,
            group_size=128)
        params = jax.block_until_ready(params)
    else:
        cfg = LlamaConfig(max_seq=2048)
        params = build_quant_params(cfg, jax.random.PRNGKey(0))
        params = jax.block_until_ready(params)
    print(f"# params built in {time.time()-t0:.1f}s", flush=True)

    N_LO, N_HI = 1, 9

    def two_point(chain, tag, *data, n_hi=None):
        n_hi = n_hi or N_HI
        f = jax.jit(chain)
        np.asarray(f(jnp.float32(0), jnp.int32(N_LO), *data))
        best = {}
        for n in (N_LO, n_hi):
            b = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                np.asarray(f(jnp.float32(1e-30), jnp.int32(n), *data))
                b = min(b, time.perf_counter() - t0)
            best[n] = b
        dt = (best[n_hi] - best[N_LO]) / (n_hi - N_LO)
        if dt <= 0:
            dt = float("inf")       # noise swamped the diff: reject
        print(f"#   {tag}: {dt*1e3:.3f} ms/pass (n_hi={n_hi})", flush=True)
        return dt

    if model == "gpt2":
        shapes = {
            "w_qkv": (cfg.dim, 3 * cfg.dim),
            "w_o": (cfg.dim, cfg.dim),
            "w_up": (cfg.dim, 4 * cfg.dim),
            "w_down": (4 * cfg.dim, cfg.dim),
        }
        bits = 8
    else:
        kvd = cfg.n_kv_heads * cfg.head_dim
        shapes = {
            "wqkv": (cfg.dim, cfg.dim + 2 * kvd),
            "wo": (cfg.dim, cfg.dim),
            "w_gateup": (cfg.dim, 2 * cfg.intermediate),
            "w_down": (cfg.intermediate, cfg.dim),
        }
        bits = int(os.environ.get("BENCH_BITS", "4"))
    rows_x = int(os.environ.get("QMM_ROWS", "16" if model == "gpt2"
                                else "1"))
    report = {"per_shape": {}}
    table = {}

    refine = json.load(open(os.environ["QMM_REFINE"])) \
        if os.environ.get("QMM_REFINE") else None

    def sweep(name, din, dout, qls):
        wbytes = sum(int(q.qweight.size) + int(q.scales.size)
                     * q.scales.dtype.itemsize for q in qls)
        x0 = jnp.ones((rows_x, din), jnp.bfloat16)
        dout_phys = qls[0].out_physical      # padded columns tile over
        # slab candidates run on PAIRED-scale twins (half the scale
        # rows; timing-valid stand-in for quantize_weight(paired=True))
        qls_p = [type(q)(q.qweight, q.scales[:q.scales.shape[0] // 2],
                         q.bits, q.group_size, q.out_logical)
                 for q in qls] if bits == 4 else None
        if refine is not None:
            # refine mode: top-3 of a prior sweep, much longer chains
            # (noise at the 0.4ms/pass shapes swamped a 9-pass diff)
            prior = refine["per_shape"][name]
            ranked = sorted((v["ms"], k) for k, v in prior.items()
                            if v["ms"] > 0)
            cands = []
            for _, k in ranked[:4]:
                variant, bn = k.split(":bn")
                cands.append((variant, int(bn)))
        else:
            cands = []
            for bn in divisor_bns(dout_phys):
                tile_mb = (din // (2 if bits == 4 else 1)) * bn / 1e6
                grid = dout_phys // bn
                if tile_mb > 6.0 or (tile_mb < 0.2 and grid > 64):
                    continue
                cands.append(("group", bn))
                if bits == 4 and os.environ.get("QMM_SLAB", "1") == "1":
                    cands.append(("slab", bn))
                if os.environ.get("QMM_W4A8", "1") == "1":
                    # round-5: int8-activation variant (int8 MXU dots,
                    # no bf16 decode pass) — gated by PPL_GATE_V3 before
                    # it can ship as a shape's tuned default
                    cands.append(("w4a8", bn))
            cands.append(("chunk", 0))      # current default chunk config
            if os.environ.get("QMM_2D"):
                kr = qls[0].qweight.shape[0]
                for bn in divisor_bns(dout_phys, hi=4096):
                    for kb in (128, 256, 512):
                        if kb % 128 or kr % kb or kr == kb:
                            continue
                        tile = kb * bn
                        grid = (dout_phys // bn) * (kr // kb)
                        if not (2 << 17) <= tile <= (2 << 20):
                            continue
                        if grid > 256 or grid < 8:
                            continue
                        cands.append((f"group2d:{kb}", bn))
        rows = {}
        best = None
        for variant, bn in cands:
            def chain(seed, n, qls, x0, variant=variant, bn=bn):
                def body(i, acc):
                    a = acc
                    for q in qls:
                        x = x0 + a.astype(jnp.bfloat16)
                        if variant.startswith("group2d:"):
                            kb = int(variant.split(":")[1])
                            out = qm.quant_matmul_2d(x, q, bn, kb)
                        else:
                            out = qm.quant_matmul(x, q, block_out=bn,
                                                  variant=variant)
                        a = jnp.mean(out).astype(jnp.float32) * 1e-30
                    return a
                return jax.lax.fori_loop(0, n, body, seed)
            n_hi = (49 if refine is not None else None)
            data = qls_p if variant == "slab" else qls
            dt = two_point(chain, f"{name}:{variant}:bn{bn}", data, x0,
                           n_hi=n_hi)
            rows[f"{variant}:bn{bn}"] = {
                "ms": round(dt * 1e3, 4),
                "gbps": round(wbytes / dt / 1e9, 1)}
            if best is None or dt < best[0]:
                best = (dt, variant, bn)
        report["per_shape"][name] = rows
        _, variant, bn = best
        entry = {"bn": bn, "variant": variant}
        if variant.startswith("group2d:"):
            entry = {"bn": bn, "variant": "group2d",
                     "kb": int(variant.split(":")[1])}
        table[f"{din}:{dout}:{bits}"] = entry
        with open(REPORT, "w") as f:
            json.dump(report, f, indent=1)
        print(f"# {name} best: {variant} bn={bn}", flush=True)

    only = os.environ.get("QMM_ONLY")
    for name, (din, dout) in shapes.items():
        if only and name not in only.split(","):
            continue
        qls = [layer[name] for layer in params["layers"]]
        sweep(name, din, dout, qls)
    if model != "gpt2" and (not only or "lm_head" in only):
        sweep("lm_head", cfg.dim, cfg.vocab_size, [params["lm_head"]] * 4)

    if os.path.exists(TABLE):           # merge over the existing table
        old = json.load(open(TABLE))
        old.update(table)
        table = old
    with open(TABLE, "w") as f:
        json.dump(table, f, indent=1)
    qm._load_tune.cache_clear()
    print(f"# table written: {json.dumps(table)}", flush=True)

    # ---- decode step with the table active ------------------------------
    if model == "gpt2":
        # serving-side re-measure happens in tools/serving_budget.py /
        # serving_bench with the new table active
        print(json.dumps({"metric": "qmm tune (gpt2 shapes)",
                          "table": table}))
        return
    cache = init_kv_cache(cfg, 1, kv_quant=True)
    cache = jax.block_until_ready(cache)
    tok = jnp.zeros((1,), jnp.int32)
    p0 = jnp.full((1,), 1024, jnp.int32)
    times = {}
    for n in (8, 40):
        f = jax.jit(lambda prm, t, ps, c, n=n: llama_decode_multi(
            prm, cfg, t, ps, c, n)[0])
        np.asarray(f(params, tok, p0, cache))
        b = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = f(params, tok, p0, cache)
            np.asarray(out)
            b = min(b, time.perf_counter() - t0)
        times[n] = b
        print(f"# decode scan n={n}: {b*1e3:.2f} ms", flush=True)
    per_step = (times[40] - times[8]) / 32
    hbm = measure_hbm_bw(params, cfg, 1)
    report["tuned_decode"] = {
        "per_step_ms": round(per_step * 1e3, 4),
        "tok_s": round(1.0 / per_step, 2),
        "hbm_gbps_tuned_calibration": round(hbm / 1e9, 1),
    }
    with open(REPORT, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({"metric": "qmm tune", **report["tuned_decode"]}))


if __name__ == "__main__":
    if (os.environ.get("BENCH_WATCHDOG", "1") == "1"
            and not os.environ.get("BENCH_CHILD")):
        from infinitensor_tpu.utils.watchdog import babysit
        sys.exit(babysit(
            [sys.executable, os.path.abspath(__file__)],
            quiet_s=600.0, gap_s=420.0, attempts=2,
            env=dict(os.environ, BENCH_CHILD="1")))
    main()
