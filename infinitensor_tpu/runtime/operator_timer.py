"""Standalone per-operator micro-benchmarks.

The analog of the reference's operator-timer FFI (reference
src/cuda/operator_timer.cc + python/infinitensor/operator_timer.py:
getPerfConvCudnn / getPerfMatmulCublas exposed to Python). Here each entry
builds the op through the graph API, compiles it standalone, and returns
ms/call — usable both interactively and as the PerfEngine seeding tool.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from infinitensor_tpu.core.handler import GraphHandler
from infinitensor_tpu.runtime.profiling import timeit


def _time_graph(h: GraphHandler, feeds: dict, warmup=2, rounds=10) -> float:
    ex = h.executor()
    inputs = ex._materialize_inputs(feeds)
    fn = ex._compiled(inputs)
    w = ex._weight_arrays()
    return timeit(lambda: fn(inputs, w), warmup=warmup, rounds=rounds)


def get_perf_conv(n, c, h_, w_, f, r, s, pad=0, stride=1, dilation=1,
                  dtype=np.float32) -> float:
    g = GraphHandler()
    x = g.input((n, c, h_, w_))
    wt = g.weight(np.random.default_rng(0).standard_normal(
        (f, c, r, s)).astype(dtype))
    g.conv(x, wt, pads=(pad, pad), strides=(stride, stride),
           dilations=(dilation, dilation))
    g.graph.infer_output_roles()
    return _time_graph(g, {})


def get_perf_matmul(b, m, n, k, dtype=np.float32) -> float:
    g = GraphHandler()
    shape_a = (b, m, k) if b > 1 else (m, k)
    shape_b = (b, k, n) if b > 1 else (k, n)
    a = g.input(shape_a)
    w = g.input(shape_b)
    g.matmul(a, w)
    g.graph.infer_output_roles()
    return _time_graph(g, {})


def get_perf_quant_matmul(m, k, n, bits=8, group=128) -> float:
    import jax
    import jax.numpy as jnp
    from infinitensor_tpu.quant.weight_only import quantize_weight, wo_matmul
    w = quantize_weight(
        jax.random.normal(jax.random.PRNGKey(0), (k, n), jnp.float32),
        bits=bits, group_size=group)
    x = jax.random.normal(jax.random.PRNGKey(1), (m, k), jnp.bfloat16)
    import functools
    fn = jax.jit(functools.partial(wo_matmul))
    return timeit(lambda: fn(x, w))


def get_perf_decode_attention(b, h_, s, d, ctx: Optional[int] = None
                              ) -> float:
    import jax
    import jax.numpy as jnp
    from infinitensor_tpu.kernels.attention import decode_attention_gqa
    key = jax.random.PRNGKey(0)
    kc = jax.random.normal(key, (b, h_, s, d), jnp.bfloat16)
    vc = jax.random.normal(key, (b, h_, s, d), jnp.bfloat16)
    q = jax.random.normal(key, (b, h_, 1, d), jnp.bfloat16)
    kv = jax.random.normal(key, (b, h_, 1, d), jnp.bfloat16)
    pos = jnp.full((b,), (ctx or s // 2), jnp.int32)
    fn = jax.jit(decode_attention_gqa)
    return timeit(lambda: fn(kc, vc, q, kv, kv, pos))
