"""KV-cache slot management.

The reference manages KV state as heap-allocated tensor clones on a dedicated
allocator region (GraphObj::cloneKV / free_heap / trim_memory, reference
src/core/graph.cc:578-633). The TPU-native design is a *slot* cache: one
static buffer [L, B_slots, Hkv, S_max, D] whose batch dimension is a pool of
sequence slots — all updates are dynamic_update_slice on donated buffers, so
XLA performs them in place in HBM and shapes never change (no recompiles,
CUDA-Graph-style replay for free).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, donate_argnums=0, static_argnums=(1, 2))
def clone_kv_slot(cache: dict, src: int, dst: int) -> dict:
    """Copy sequence state between slots (reference cloneKV analog —
    used to fork a sequence, e.g. for beam/speculative branches)."""
    out = {}
    for key in ("k", "v"):
        buf = cache[key]
        row = jax.lax.dynamic_slice_in_dim(buf, src, 1, axis=1)
        out[key] = jax.lax.dynamic_update_slice_in_dim(buf, row, dst, axis=1)
    return out


@functools.partial(jax.jit, donate_argnums=0, static_argnums=1)
def clear_kv_slot(cache: dict, slot: int) -> dict:
    """Zero a slot (reference free_heap analog; numerically inert since
    positions gate attention, but keeps state hygienic)."""
    out = {}
    for key in ("k", "v"):
        buf = cache[key]
        zero = jnp.zeros_like(jax.lax.dynamic_slice_in_dim(buf, slot, 1, 1))
        out[key] = jax.lax.dynamic_update_slice_in_dim(buf, zero, slot, axis=1)
    return out


@functools.partial(jax.jit, donate_argnums=0, static_argnums=2)
def write_prefill_into_slot(cache: dict, prefill_cache: dict, slot: int
                            ) -> dict:
    """Merge a single-sequence prefill cache [L, 1, H, S, D] into `slot` of
    the serving cache [L, B, H, S_max, D]."""
    out = {}
    for key in ("k", "v"):
        buf = cache[key]
        seg = prefill_cache[key].astype(buf.dtype)
        s = seg.shape[3]
        update = jax.lax.dynamic_update_slice(
            jax.lax.dynamic_slice_in_dim(buf, slot, 1, axis=1),
            seg, (0, 0, 0, 0, 0))
        out[key] = jax.lax.dynamic_update_slice_in_dim(buf, update, slot,
                                                       axis=1)
    return out
