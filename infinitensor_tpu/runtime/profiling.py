"""Profiling / timing utilities.

Reference analogs (SURVEY §5): ``timeit`` harness (include/core/common.h:93),
per-op profiling tables (printProfilingData, src/core/runtime.cc:130-138),
plus TPU-native additions: xprof trace capture and compiled-HLO cost
analysis (the reference has no timeline tracer).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Optional

import jax
import numpy as np


def host_fetch(out) -> None:
    """End a timed region by fetching a compute-dependent output to the
    host. On the axon platform ``jax.block_until_ready`` can return early
    (CLAUDE.md timing doctrine); np.asarray of real output bytes cannot."""
    np.asarray(jax.tree_util.tree_leaves(out)[0])


def timeit(fn: Callable, *args, warmup: int = 2, rounds: int = 10) -> float:
    """ms/call via host-fetch-terminated regions with two-point
    launch-overhead cancellation (reference timeit, common.h:93; the
    methodology is tools/bw_diag.py)."""
    for _ in range(max(1, warmup)):
        host_fetch(fn(*args))
    rounds = max(2, rounds)

    def region(n: int) -> float:
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = fn(*args)
        host_fetch(out)
        return time.perf_counter() - t0

    t1 = region(1)
    tn = region(rounds)
    est = (tn - t1) / (rounds - 1)
    if est <= 0.0:
        # noise dominated the two-point pair (t1 caught a scheduling
        # stall — happens on a loaded host): fall back to the
        # launch-inclusive per-call mean, a strict upper bound that is
        # always positive, instead of reporting an impossible 0
        est = tn / rounds
    return est * 1e3


@contextlib.contextmanager
def xprof_trace(logdir: str = "/tmp/infinitpu_trace"):
    """Capture a profiler trace viewable in xprof/tensorboard."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def compiled_cost(fn: Callable, *args) -> dict:
    """Static cost analysis of the compiled executable (flops, bytes,
    peak memory) — the TPU-native 'getPerfTime without running' analog."""
    lowered = jax.jit(fn).lower(*args)
    compiled = lowered.compile()
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
    except Exception:
        ca = {}
    try:
        mem = compiled.memory_analysis()
        mem_stats = {
            "output_bytes": getattr(mem, "output_size_in_bytes", None),
            "temp_bytes": getattr(mem, "temp_size_in_bytes", None),
            "argument_bytes": getattr(mem, "argument_size_in_bytes", None),
        }
    except Exception:
        mem_stats = {}
    return {
        "flops": ca.get("flops"),
        "bytes_accessed": ca.get("bytes accessed"),
        "transcendentals": ca.get("transcendentals"),
        **mem_stats,
    }


def profile_table(executor, inputs: Optional[dict] = None) -> str:
    """Formatted per-op timing table (reference printProfilingData)."""
    rows = executor.profile(inputs)
    total = sum(r[2] for r in rows)
    lines = [f"{'op':<32}{'type':<20}{'ms':>10}{'%':>8}"]
    for name, op_type, ms in sorted(rows, key=lambda r: -r[2]):
        pct = 100.0 * ms / total if total else 0.0
        lines.append(f"{name[:31]:<32}{op_type:<20}{ms:>10.4f}{pct:>7.1f}%")
    lines.append(f"{'TOTAL':<52}{total:>10.4f}")
    return "\n".join(lines)


def memory_report(graph) -> dict:
    """Engine-level memory plan via the native planner, with graceful
    fallback (reference LazyAllocator::info peak print)."""
    try:
        from infinitensor_tpu.native import plan_graph_memory
        return plan_graph_memory(graph)
    except Exception:
        from infinitensor_tpu.core.tensor import TensorRole
        return {
            "peak_bytes": None,
            "weight_bytes": sum(t.bytes() for t in graph.weights()),
            "activation_bytes": sum(
                t.bytes() for t in graph.tensors
                if t.role == TensorRole.OTHERS),
        }
