"""Serving-path utilization budget v2 (round-4 verdict item 2, round-5
drain decomposition).

Splits the GPT-2 345M 16-slot continuous-batching run's wall time into
prefill / decode dispatch / decode fetch (device compute drains here) /
host bookkeeping / other, counts prefill tokens separately from decode
tokens, measures the per-launch tunnel round-trip, and derives the
decode-phase ceilings the measured number should be judged against:

  weight_stream_bound = slots * HBM / bytes_per_step    (compute only)
  launch_charged_bound = adds one launch RT per pipeline group

v2 decomposes the dominant slice (decode_fetch_device_drain) into three
measured terms that must sum to the drain within 10%:

  on_device   chunk-kernel time, measured ALONE via a fori_loop around
              the fused chunk body in ONE executable (chained two-point
              + host fetch — no launch overhead in the number)
  bubble      per-launch residue the async pipeline cannot hide
              (drain/launches - on_device_chunk)
  occupancy   useful tokens / slot-steps burned (engine-counted:
              stats[decode_tokens] / stats[slot_steps_*]) — replaces
              the round-4 placeholder

Writes docs/SERVING_BUDGET.json. Reference analog: per-launcher avg
latency reporting, examples/distributed/cuda/cuda_launch.py:62-76.

Run: python tools/serving_budget.py  (real TPU; one process at a time)
Env: SERVE_SLOTS/SERVE_CHUNK/SERVE_PIPELINE as serving_bench; BUDGET_HBM
     overrides the assumed stream rate (GB/s).
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


def measure_launch_rt_ms(n: int = 7) -> float:
    """Per-launch round-trip through the tunnel: dispatch a trivial
    compiled program and host-fetch its output, min over n."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    f = jax.jit(lambda x: x + 1.0)
    np.asarray(f(jnp.float32(0.0)))        # compile
    best = float("inf")
    for i in range(n):
        t0 = time.perf_counter()
        np.asarray(f(jnp.float32(i)))
        best = min(best, time.perf_counter() - t0)
    return 1e3 * best


def quant_param_bytes(params) -> int:
    """HBM bytes a decode step must stream: quantized weights + scales +
    norm vectors + (bf16) lm_head path. Embedding gathers are per-token
    rows (negligible)."""
    import jax
    from infinitensor_tpu.quant.weight_only import QuantizedLinear

    total = 0
    seen = set()

    def walk(o):
        nonlocal total
        if isinstance(o, QuantizedLinear):
            total += int(o.qweight.size) * o.qweight.dtype.itemsize
            total += int(o.scales.size) * o.scales.dtype.itemsize
        elif isinstance(o, dict):
            for k, v in o.items():
                # gathers, not streamed (wte's matmul role is carried by
                # the int8 lm_head_q copy since round 5)
                if k in ("embed", "wte", "wpe"):
                    continue
                walk(v)
        elif isinstance(o, (list, tuple)):
            for v in o:
                walk(v)
        elif hasattr(o, "size") and id(o) not in seen:
            seen.add(id(o))
            total += int(o.size) * o.dtype.itemsize
    walk(params)
    return total


def measure_chunk_device_ms(params, cfg, decode_fn, cache, chunk: int,
                            slots: int) -> float:
    """Pure on-device time of ONE fused decode chunk: fori_loop around
    the chunk's scan body inside a single executable, runtime trip
    count, two-point diff, min-of-3, closing host fetch. No launch
    overhead, no host bookkeeping — the kernel-side term of the drain
    decomposition."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    def fused_n(p, n, t, ps, c):
        def chunk_body(carry, _):
            tok, pp, cc = carry
            logits, cc = decode_fn(p, cfg, tok, pp, cc)
            nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            return (nxt, pp + 1, cc), ()

        def outer(i, carry):
            tok, pp, cc = carry
            (tok, pp, cc), _ = jax.lax.scan(
                chunk_body, (tok, pp, cc), length=chunk)
            # keep pos bounded so long trip counts don't walk off the
            # cache: wrap back to the warm region
            pp = jnp.where(pp >= cfg.max_seq - chunk - 1,
                           jnp.full_like(pp, 64), pp)
            return (tok, pp, cc)

        tok, pp, cc = jax.lax.fori_loop(0, n, outer, (t, ps, c))
        return tok, pp, cc

    f = jax.jit(fused_n)
    tok = jnp.zeros((slots,), jnp.int32)
    pos = jnp.full((slots,), 64, jnp.int32)

    def run_n(n):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            o, _, c2 = f(params, jnp.int32(n), tok, pos, cache)
            np.asarray(o)
            best = min(best, time.perf_counter() - t0)
        return best

    np.asarray(f(params, jnp.int32(1), tok, pos, cache)[0])   # compile
    n_lo, n_hi = 1, 9
    return 1e3 * (run_n(n_hi) - run_n(n_lo)) / (n_hi - n_lo)


def _decompose(s, best, chunk_dev_ms: float, chunk: int, slots: int):
    """Three measured terms that must sum to the decode drain within
    ~10%: on-device kernel time, per-launch bubble, and (separately
    reported) the occupancy discount that maps slot-steps to useful
    tokens."""
    drain_s = s.get("decode_dispatch_s", 0) + s.get("decode_fetch_s", 0)
    launches = max(int(s.get("decode_launches", 0)), 1)
    on_device_s = launches * chunk_dev_ms / 1e3
    bubble_s = drain_s - on_device_s
    return {
        "decode_wall_s": round(drain_s, 3),
        "decode_launches": launches,
        "on_device_chunk_ms": round(chunk_dev_ms, 3),
        "on_device_total_s": round(on_device_s, 3),
        "pipeline_bubble_total_s": round(bubble_s, 3),
        "pipeline_bubble_per_launch_ms": round(
            1e3 * bubble_s / launches, 2),
        "device_tok_s_at_full_occupancy": round(
            slots * chunk / (chunk_dev_ms / 1e3), 1),
    }


def _sum_check(s, chunk_dev_ms: float, launch_rt_ms: float,
               pipeline: int):
    """Independent reconstruction of the drain: on-device kernel time
    (measured alone) + one tunnel round-trip per pipeline GROUP
    (measured alone). If this lands within ~10% of the measured drain,
    the drain is explained; the residue term is whatever's left."""
    drain_s = s.get("decode_dispatch_s", 0) + s.get("decode_fetch_s", 0)
    launches = max(int(s.get("decode_launches", 0)), 1)
    groups = launches / max(pipeline, 1)
    predicted = launches * chunk_dev_ms / 1e3 + groups * launch_rt_ms / 1e3
    return {
        "predicted_drain_s": round(predicted, 3),
        "measured_drain_s": round(drain_s, 3),
        "predicted_over_measured": round(predicted / max(drain_s, 1e-9),
                                         3),
        "unexplained_residue_s": round(drain_s - predicted, 3),
    }


def main():
    import jax
    import numpy as np
    from infinitensor_tpu.models.gpt2 import (
        GPT2Config, init_gpt2_params, quantize_gpt2_params, gpt2_prefill,
        gpt2_decode_step, init_gpt2_cache)
    from infinitensor_tpu.serving import ServingEngine

    dev0 = jax.devices()[0]
    np.asarray(jax.numpy.zeros((1,)))
    print(f"# device ready: {getattr(dev0, 'device_kind', dev0.platform)}",
          file=sys.stderr)

    launch_rt_ms = measure_launch_rt_ms()
    print(f"# launch rt: {launch_rt_ms:.1f} ms", file=sys.stderr)

    cfg = GPT2Config(max_seq=int(os.environ.get("SERVE_MAXSEQ", "384")))
    if os.environ.get("BUDGET_TINY"):      # CPU smoke of the tool itself
        cfg = GPT2Config(n_layers=2, dim=256, n_heads=4,
                         vocab_size=1024, max_seq=128)
    params = quantize_gpt2_params(
        init_gpt2_params(cfg, jax.random.PRNGKey(0)), bits=8,
        group_size=128,
        quant_lm_head=os.environ.get("GPT2_QLMHEAD", "1") == "1")
    np.asarray(jax.tree_util.tree_leaves(params)[-1].ravel()[:4])

    chunk = int(os.environ.get("SERVE_CHUNK", "32"))
    slots = int(os.environ.get("SERVE_SLOTS", "16"))
    pipeline = int(os.environ.get("SERVE_PIPELINE", "4"))
    eng = ServingEngine(params, cfg, max_slots=slots,
        lookahead=os.environ.get("SERVE_LOOKAHEAD", "1") == "1",
                        prefill_buckets=(64, 256),
                        prefill_fn=gpt2_prefill,
                        decode_fn=gpt2_decode_step,
                        init_cache_fn=init_gpt2_cache, decode_chunk=chunk,
                        pipeline_depth=pipeline)
    t0 = time.time()
    eng.warmup()
    warmup_s = time.time() - t0
    print(f"# warmed up in {warmup_s:.1f}s", file=sys.stderr)

    chunk_dev_ms = measure_chunk_device_ms(
        params, cfg, gpt2_decode_step, eng.cache, chunk, slots)
    print(f"# on-device fused chunk: {chunk_dev_ms:.2f} ms "
          f"({chunk} steps)", file=sys.stderr)

    rng = np.random.default_rng(0)
    n_req = int(os.environ.get("BUDGET_REQS", str(max(24, 3 * slots))))
    max_new = int(os.environ.get("BUDGET_NEW", "64"))
    lens = rng.integers(16, min(250, cfg.max_seq - max_new - 2), n_req)
    prompts = [list(rng.integers(1, 50000, int(n))) for n in lens]

    samples = []
    best = None
    for _ in range(2):
        eng.stats.clear()
        base_tok, base_steps = eng.tokens_out, eng.steps
        reqs = [eng.submit(list(p), max_new_tokens=max_new)
                for p in prompts]
        t0 = time.time()
        eng.run_to_completion()
        wall = time.time() - t0
        assert all(r.done for r in reqs)
        tok = eng.tokens_out - base_tok
        tok_s = tok / wall
        samples.append(round(tok_s, 1))
        if best is None or tok_s >= max(samples):
            best = {"wall_s": wall, "tokens": tok,
                    "decode_steps": eng.steps - base_steps,
                    "stats": dict(eng.stats)}

    s = best["stats"]
    wall = best["wall_s"]
    tracked = (s.get("prefill_s", 0) + s.get("decode_dispatch_s", 0)
               + s.get("decode_fetch_s", 0) + s.get("decode_host_s", 0))
    prefill_tokens = int(s.get("prefill_tokens", 0))
    # ceilings
    hbm_gbps = float(os.environ.get("BUDGET_HBM", "558"))
    step_bytes = quant_param_bytes(params)
    decode_ceiling = slots * hbm_gbps * 1e9 / step_bytes
    group_tokens = slots * chunk * pipeline
    launch_charged = group_tokens / (
        group_tokens / decode_ceiling + launch_rt_ms / 1e3)

    art = {
        "metric": "gpt2-345m int8 serving utilization budget "
                  f"({slots} slots, chunk {chunk}, pipeline {pipeline})",
        "tokens_s_samples": samples,
        "tokens_s_best": max(samples),
        "wall_s": round(wall, 3),
        "slices_s": {
            "prefill": round(s.get("prefill_s", 0), 3),
            "decode_dispatch": round(s.get("decode_dispatch_s", 0), 3),
            "decode_fetch_device_drain":
                round(s.get("decode_fetch_s", 0), 3),
            "host_bookkeeping": round(s.get("decode_host_s", 0), 3),
            "other_untracked": round(wall - tracked, 3),
        },
        "counts": {
            "requests": n_req,
            "prefill_launches": int(s.get("prefill_launches", 0)),
            "prefill_prompt_tokens": prefill_tokens,
            "prefill_lane_tokens": int(s.get("prefill_lane_tokens", 0)),
            "decode_launches": int(s.get("decode_launches", 0)),
            "decode_steps": best["decode_steps"],
            "total_tokens_out": best["tokens"],
        },
        "launch_rt_ms": round(launch_rt_ms, 2),
        "denominators": {
            "hbm_gbps_assumed": hbm_gbps,
            "weight_bytes_per_decode_step": step_bytes,
            "decode_phase_weight_stream_bound_tok_s":
                round(decode_ceiling, 0),
            "launch_charged_bound_tok_s": round(launch_charged, 0),
            "note": "bounds assume all slots live every step; see "
                    "occupancy (measured) below",
        },
        "drain_decomposition": _decompose(
            s, best, chunk_dev_ms, chunk, slots),
        "drain_sum_check": _sum_check(s, chunk_dev_ms, launch_rt_ms,
                                      pipeline),
        "occupancy": {
            "decode_tokens": int(s.get("decode_tokens", 0)),
            "slot_steps_active": int(s.get("slot_steps_active", 0)),
            "slot_steps_total": int(s.get("slot_steps_total", 0)),
            "useful_per_active_slot_step": round(
                s.get("decode_tokens", 0)
                / max(s.get("slot_steps_active", 1), 1), 3),
            "useful_per_total_slot_step": round(
                s.get("decode_tokens", 0)
                / max(s.get("slot_steps_total", 1), 1), 3),
        },
        "warmup_s": round(warmup_s, 1),
        "device": str(dev0),
    }
    out = os.path.join(_ROOT, "docs", "SERVING_BUDGET.json")
    with open(out, "w") as f:
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
