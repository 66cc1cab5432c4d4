"""Kernel autotuner: multi-config timing with persistent cache.

The analog of the reference's per-kernel multi-algorithm tuning
(reference include/core/kernel.h:32-205 ``computeFuncTune`` picking the
fastest ``ComputeFuncPtr``; cuBLAS 24-algo loop in
src/kernels/cuda/matmul.cc:25-187): a kernel exposes static tuning knobs
(Pallas block sizes), the tuner times each candidate on the target device
and records the winner in the PerfEngine JSON cache keyed by
(kernel, arg shapes/dtypes, device kind) so later runs skip the sweep.
"""

from __future__ import annotations

import time
from typing import Any, Callable, Optional, Sequence

import jax

from infinitensor_tpu.runtime.perf import PerfEngine


def _device_kind() -> str:
    try:
        return jax.devices()[0].device_kind
    except Exception:
        return "unknown"


def _args_sig(args) -> list:
    sig = []
    for a in jax.tree_util.tree_leaves(args):
        if hasattr(a, "shape"):
            sig.append([list(a.shape), str(getattr(a, "dtype", ""))])
        else:
            sig.append([repr(a)])
    return sig


def _time_call(fn: Callable, args, warmup: int = 1, iters: int = 5) -> float:
    """ms/call via the repo's honest-timing protocol (host-fetch-terminated
    two-point regions, runtime/profiling.py:timeit) — block_until_ready
    can return early on this platform and would mis-rank configs."""
    from infinitensor_tpu.runtime.profiling import timeit
    return timeit(fn, *args, warmup=warmup, rounds=max(2, iters))


def tune(name: str, make_fn: Callable[[dict], Callable],
         configs: Sequence[dict], args,
         perf_engine: Optional[PerfEngine] = None,
         warmup: int = 1, iters: int = 5) -> dict:
    """Pick the fastest config for ``make_fn(config)(*args)``.

    Returns the winning config; the choice (and its time) is cached in the
    PerfEngine keyed by kernel name + arg signature + device kind, so the
    sweep runs once per workload per device.
    """
    if not configs:
        raise ValueError("no configs to tune over")
    pe = perf_engine or PerfEngine.instance()
    key = ["kernel_tune", name, _device_kind(), _args_sig(args)]
    cached = pe.get(key)
    if isinstance(cached, dict) and "config" in cached:
        return cached["config"]

    best_cfg, best_ms = None, float("inf")
    for cfg in configs:
        try:
            fn = make_fn(cfg)
            ms = _time_call(fn, args, warmup, iters)
        except Exception:
            continue  # config invalid on this device (e.g. VMEM overflow)
        if ms < best_ms:
            best_cfg, best_ms = cfg, ms
    if best_cfg is None:
        raise RuntimeError(f"{name}: every tuning config failed")
    pe.set(key, {"config": best_cfg, "time_ms": best_ms})
    return best_cfg


# -- pre-wired sweeps for the in-tree Pallas kernels -------------------------

def tuned_flash_decode(q, k_cache, v_cache, pos,
                       perf_engine: Optional[PerfEngine] = None):
    """flash_decode with the seq_block knob swept (kernels/attention.py)."""
    from infinitensor_tpu.kernels.attention import flash_decode
    S = k_cache.shape[2]
    candidates = [{"seq_block": b} for b in (256, 512, 1024, 2048)
                  if b <= max(S, 256)]
    cfg = tune("flash_decode",
               lambda c: (lambda *a: flash_decode(*a, **c)),
               candidates, (q, k_cache, v_cache, pos), perf_engine)
    return flash_decode(q, k_cache, v_cache, pos, **cfg)


def tuned_flash_decode_q8(q, k_cache, v_cache, k_scale, v_scale, pos,
                          perf_engine: Optional[PerfEngine] = None):
    """flash_decode_q8 (INT8 KV) with the seq_block knob swept."""
    from infinitensor_tpu.kernels.attention import flash_decode_q8
    S = k_cache.shape[2]
    candidates = [{"seq_block": b} for b in (256, 512, 1024, 2048)
                  if b <= max(S, 256)]
    cfg = tune("flash_decode_q8",
               lambda c: (lambda *a: flash_decode_q8(*a, **c)),
               candidates, (q, k_cache, v_cache, k_scale, v_scale, pos),
               perf_engine)
    return flash_decode_q8(q, k_cache, v_cache, k_scale, v_scale, pos, **cfg)


def tuned_quant_matmul(x, qlin, perf_engine: Optional[PerfEngine] = None):
    """quant_matmul with the output-tile knob swept (kernels/quant_matmul.py)."""
    from infinitensor_tpu.kernels.quant_matmul import quant_matmul
    dout = qlin.scales.shape[-1]
    candidates = [{"block_out": b} for b in (0, 128, 256, 512, 1024)
                  if b == 0 or (b <= dout and dout % b == 0)]
    cfg = tune("quant_matmul",
               lambda c: (lambda *a: quant_matmul(*a, **c)),
               candidates, (x, qlin), perf_engine)
    return quant_matmul(x, qlin, **cfg)
