"""Sequence parallelism: ring attention + Ulysses (DeepSpeed-style).

Green-field capability the reference lacks entirely (SURVEY §5: its only
long-context tooling is the single-device decode kernel and Longformer band
matmuls). Both schemes run inside shard_map over a mesh axis that shards the
sequence dimension:

* ring_attention: K/V blocks rotate around the ring via lax.ppermute while
  each device holds its Q shard; online-softmax accumulation keeps the
  computation exact. Comm rides ICI neighbor links — bandwidth-optimal for
  very long context.
* ulysses_attention: two all_to_alls re-shard sequence->heads, run *local*
  full attention (here: the flash kernel), and re-shard back. Cheaper
  compute layout when heads >= world_size.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from infinitensor_tpu.kernels.flash_attention import flash_attention, mha_ref
from infinitensor_tpu.utils.platform import is_tpu


def ring_attention_local(q, k, v, axis_name: str, causal: bool = True):
    """Per-shard body (call inside shard_map). q/k/v [B, H, Sl, D], sharded
    on the sequence axis; returns local attention output [B, H, Sl, D]."""
    B, H, Sl, D = q.shape
    world = lax.psum(1, axis_name)
    my = lax.axis_index(axis_name)
    scale = 1.0 / math.sqrt(D)
    qf = q.astype(jnp.float32)

    m = jnp.full((B, H, Sl, 1), -jnp.inf, jnp.float32)
    l = jnp.zeros((B, H, Sl, 1), jnp.float32)
    acc = jnp.zeros((B, H, Sl, D), jnp.float32)

    k_cur, v_cur = k, v
    row_ids = my * Sl + jnp.arange(Sl)

    for step in range(_static_world(axis_name)):
        src = (my - step) % world          # which shard k_cur came from
        s = jnp.einsum("bhqd,bhkd->bhqk", qf,
                       k_cur.astype(jnp.float32)) * scale
        if causal:
            col_ids = src * Sl + jnp.arange(Sl)
            mask = row_ids[:, None] >= col_ids[None, :]
            s = jnp.where(mask[None, None], s, -jnp.inf)
        m_cur = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        m_safe = jnp.where(jnp.isfinite(m_cur), m_cur, 0.0)
        alpha = jnp.where(jnp.isfinite(m), jnp.exp(m - m_safe), 0.0)
        p = jnp.where(jnp.isfinite(s), jnp.exp(s - m_safe), 0.0)
        l = l * alpha + jnp.sum(p, -1, keepdims=True)
        acc = acc * alpha + jnp.einsum("bhqk,bhkd->bhqd", p,
                                       v_cur.astype(jnp.float32))
        m = m_cur
        if step != _static_world(axis_name) - 1:
            perm = [(j, (j + 1) % _static_world(axis_name))
                    for j in range(_static_world(axis_name))]
            k_cur = lax.ppermute(k_cur, axis_name, perm)
            v_cur = lax.ppermute(v_cur, axis_name, perm)
    out = acc / jnp.maximum(l, 1e-30)
    return out.astype(q.dtype)


_WORLD_HINT: dict[str, int] = {}


def _static_world(axis_name: str) -> int:
    """Ring steps need a static trip count; shard_map knows the axis size
    at trace time via the hint set in ring_attention()."""
    return _WORLD_HINT[axis_name]


def ulysses_attention_local(q, k, v, axis_name: str, causal: bool = True):
    """Per-shard body (inside shard_map): seq-sharded -> head-sharded via
    all_to_all, local full attention, and back."""
    # [B, H, Sl, D] -> [B, H/w, S, D]
    qh = lax.all_to_all(q, axis_name, split_axis=1, concat_axis=2, tiled=True)
    kh = lax.all_to_all(k, axis_name, split_axis=1, concat_axis=2, tiled=True)
    vh = lax.all_to_all(v, axis_name, split_axis=1, concat_axis=2, tiled=True)
    if is_tpu():
        out = flash_attention(qh, kh, vh, causal=causal)
    else:
        out = mha_ref(qh, kh, vh, causal=causal)
    # [B, H/w, S, D] -> [B, H, Sl, D]
    return lax.all_to_all(out, axis_name, split_axis=2, concat_axis=1,
                          tiled=True)


def _sharded_attention(kind: str, q, k, v, mesh, axis_name: str,
                       causal: bool):
    from jax.sharding import PartitionSpec as P

    world = mesh.shape[axis_name]
    _WORLD_HINT[axis_name] = world
    body = {"ring": ring_attention_local,
            "ulysses": ulysses_attention_local}[kind]
    spec = P(None, None, axis_name, None)
    fn = jax.shard_map(
        partial(body, axis_name=axis_name, causal=causal),
        mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False)
    return jax.jit(fn)(q, k, v)


def ring_attention(q, k, v, mesh, axis_name: str = "sp",
                   causal: bool = True):
    """q/k/v [B, H, S, D] with S sharded over mesh[axis_name]."""
    return _sharded_attention("ring", q, k, v, mesh, axis_name, causal)


def ulysses_attention(q, k, v, mesh, axis_name: str = "sp",
                      causal: bool = True):
    return _sharded_attention("ulysses", q, k, v, mesh, axis_name, causal)
