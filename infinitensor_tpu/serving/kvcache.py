"""KV-cache slot management.

The reference manages KV state as heap-allocated tensor clones on a dedicated
allocator region (GraphObj::cloneKV / free_heap / trim_memory, reference
src/core/graph.cc:578-633). The TPU-native design is a *slot* cache: per
layer, one static buffer [B_slots, Hkv, S_max, D] whose batch dimension is a
pool of sequence slots — all updates are dynamic_update_slice on donated
buffers, so XLA performs them in place in HBM and shapes never change (no
recompiles, CUDA-Graph-style replay for free).

Cache layout: {"k": [L arrays], "v": [L arrays]} (see models/llama.py
init_kv_cache — per-layer buffers keep donation a true in-place write).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _map_layers(cache: dict, fn) -> dict:
    return {key: [fn(buf) for buf in bufs] for key, bufs in cache.items()}


@functools.partial(jax.jit, donate_argnums=0, static_argnums=(1, 2))
def clone_kv_slot(cache: dict, src: int, dst: int) -> dict:
    """Copy sequence state between slots (reference cloneKV analog —
    used to fork a sequence, e.g. for beam/speculative branches)."""

    def go(buf):
        row = jax.lax.dynamic_slice_in_dim(buf, src, 1, axis=0)
        return jax.lax.dynamic_update_slice_in_dim(buf, row, dst, axis=0)

    return _map_layers(cache, go)


@functools.partial(jax.jit, donate_argnums=0, static_argnums=1)
def clear_kv_slot(cache: dict, slot: int) -> dict:
    """Zero a slot (reference free_heap analog; numerically inert since
    positions gate attention, but keeps state hygienic)."""

    def go(buf):
        zero = jnp.zeros_like(jax.lax.dynamic_slice_in_dim(buf, slot, 1, 0))
        return jax.lax.dynamic_update_slice_in_dim(buf, zero, slot, axis=0)

    return _map_layers(cache, go)


def merge_prefill_into_slot(cache: dict, prefill_cache: dict, slot) -> dict:
    """Merge a single-sequence prefill cache (per-layer [1, H, S, D]) into
    `slot` of the serving cache (per-layer [B, H, S_max, D]). ``slot`` may
    be a traced int32 scalar — one compiled program serves every slot.
    Trace-level helper; jit (with the serving cache donated) at the call
    site so the write happens in place in HBM."""
    out = {}
    for key in cache:
        rows = []
        for buf, seg in zip(cache[key], prefill_cache[key]):
            seg = seg.astype(buf.dtype)
            start = (slot,) + (0,) * (buf.ndim - 1)
            rows.append(jax.lax.dynamic_update_slice(buf, seg, start))
        out[key] = rows
    return out


@functools.partial(jax.jit, donate_argnums=0, static_argnums=2)
def write_prefill_into_slot(cache: dict, prefill_cache: dict, slot: int
                            ) -> dict:
    """Jitted one-shot wrapper around merge_prefill_into_slot (compiles per
    static slot; the serving engine uses the traced-slot path instead)."""
    return merge_prefill_into_slot(cache, prefill_cache, slot)
