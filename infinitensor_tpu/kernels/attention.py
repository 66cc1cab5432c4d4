"""Decode attention with KV-cache append.

TPU-native redesign of the reference's fused decode kernel
(src/kernels/cuda/attention_kvcache.cu): the CUDA kernel appends k/v into the
cache in-kernel and runs a SEQ_UNIT-tiled online softmax for a single query
token. Here the cache is a static-shape [B, H, S_max, D] buffer; the append is
a dynamic_update_slice (XLA lowers to an in-place HBM write when the buffer is
donated) and attention is masked over positions <= pos.

Two implementations:
  decode_attention_ref : pure jnp (oracle; also fine for XLA to fuse)
  decode_attention     : Pallas kernel, one grid step per (batch, head-block),
                         q row resident in VMEM, K/V streamed from HBM.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax import lax


def _normalize_pos(pos, batch):
    pos = jnp.asarray(pos).reshape(-1).astype(jnp.int32)
    if pos.shape[0] != batch:
        pos = jnp.broadcast_to(pos[:1], (batch,))
    return pos


def decode_attention_ref(k_cache, v_cache, q, k, v, pos):
    """Reference semantics; shapes:
    k_cache/v_cache: [B, H, S, D]; q/k/v: [B, H, 1, D]; pos: [] or [B].

    Returns (out [B,H,1,D], k_cache', v_cache').
    """
    B, H, S, D = k_cache.shape
    pos = _normalize_pos(pos, B)

    def upd(cache, new, p):
        return lax.dynamic_update_slice(cache, new, (0, p, 0))

    k_cache = jax.vmap(upd)(k_cache, k, pos)
    v_cache = jax.vmap(upd)(v_cache, v, pos)

    scale = 1.0 / math.sqrt(D)
    scores = jnp.einsum(
        "bhqd,bhsd->bhqs", q.astype(jnp.float32), k_cache.astype(jnp.float32)
    ) * scale
    mask = jnp.arange(S)[None, None, None, :] <= pos[:, None, None, None]
    scores = jnp.where(mask, scores, -jnp.inf)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhqs,bhsd->bhqd", probs, v_cache.astype(jnp.float32))
    return out.astype(q.dtype), k_cache, v_cache


def decode_attention_gqa(k_cache, v_cache, q, k, v, pos):
    """Grouped-query decode attention with cache append.

    k_cache/v_cache: [B, Hkv, S, D]; q: [B, H, 1, D] (H = Hkv * rep);
    k/v: [B, Hkv, 1, D]; pos: [B] int32.
    Returns (out [B, H, 1, D], k_cache', v_cache').
    """
    B, Hkv, S, D = k_cache.shape
    H = q.shape[1]
    if H == Hkv and jax.default_backend() == "tpu":
        return decode_attention(k_cache, v_cache, q, k, v, pos)
    pos = _normalize_pos(pos, B)

    def upd(cache, new, p):
        return lax.dynamic_update_slice(cache, new, (0, p, 0))

    k_cache = jax.vmap(upd)(k_cache, k.astype(k_cache.dtype), pos)
    v_cache = jax.vmap(upd)(v_cache, v.astype(v_cache.dtype), pos)
    rep = H // Hkv
    scale = 1.0 / math.sqrt(D)
    qf = q.astype(jnp.float32).reshape(B, Hkv, rep, D)
    scores = jnp.einsum("bgrd,bgsd->bgrs", qf,
                        k_cache.astype(jnp.float32)) * scale
    mask = jnp.arange(S)[None, None, None, :] <= pos[:, None, None, None]
    scores = jnp.where(mask, scores, -jnp.inf)
    p = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bgrs,bgsd->bgrd", p, v_cache.astype(jnp.float32))
    return (out.reshape(B, H, 1, D).astype(q.dtype), k_cache, v_cache)


# ---------------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------------

def _decode_attn_kernel(pos_ref, q_ref, k_new_ref, v_new_ref,
                        kc_ref, vc_ref, out_ref, kc_out_ref, vc_out_ref,
                        *, seq_block: int):
    """Grid: (B,). Blocks carry one batch element: [H, S, D] cache slices.

    Online-softmax over S in seq_block chunks (analog of the CUDA kernel's
    SEQ_UNIT tiling + two-pass reduction, done here in one pass).
    """
    import jax.experimental.pallas as pl  # local import keeps CPU path light

    pos = pos_ref[0]
    H, S, D = kc_ref.shape

    # Append new k/v at `pos` and write through to the cache outputs.
    kc_out_ref[:, :, :] = kc_ref[:, :, :]
    vc_out_ref[:, :, :] = vc_ref[:, :, :]
    kc_out_ref[:, pl.ds(pos, 1), :] = k_new_ref[:, :, :]
    vc_out_ref[:, pl.ds(pos, 1), :] = v_new_ref[:, :, :]

    scale = 1.0 / math.sqrt(D)
    q = q_ref[:, 0, :].astype(jnp.float32)  # [H, D]

    num_blocks = pl.cdiv(S, seq_block)

    def body(i, carry):
        m_prev, l_prev, acc = carry
        start = i * seq_block
        kb = kc_out_ref[:, pl.ds(start, seq_block), :].astype(jnp.float32)
        vb = vc_out_ref[:, pl.ds(start, seq_block), :].astype(jnp.float32)
        s = jnp.einsum("hd,hsd->hs", q, kb,
                       preferred_element_type=jnp.float32) * scale
        idx = start + lax.broadcasted_iota(jnp.int32, (1, seq_block), 1)
        s = jnp.where(idx <= pos, s, -jnp.inf)
        m_cur = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m_prev - m_cur)
        p = jnp.exp(s - m_cur)
        l_cur = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha
        acc = acc + jnp.einsum("hs,hsd->hd", p, vb,
                               preferred_element_type=jnp.float32)
        return m_cur, l_cur, acc

    m0 = jnp.full((H, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((H, 1), jnp.float32)
    acc0 = jnp.zeros((H, D), jnp.float32)
    # Only iterate blocks that intersect [0, pos].
    n_active = lax.div(pos, seq_block) + 1
    m, l, acc = lax.fori_loop(0, n_active, body, (m0, l0, acc0))
    out_ref[:, 0, :] = (acc / l).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("seq_block",))
def decode_attention(k_cache, v_cache, q, k, v, pos, *, seq_block: int = 256):
    """Pallas fused decode attention. Falls back to ref on non-TPU backends."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if jax.default_backend() not in ("tpu",):
        return decode_attention_ref(k_cache, v_cache, q, k, v, pos)

    B, H, S, D = k_cache.shape
    seq_block = min(seq_block, S)
    pos = _normalize_pos(pos, B)

    grid = (B,)
    batch_block = lambda *dims: pl.BlockSpec(
        (1, *dims), lambda b: (b, *(0,) * len(dims)))

    out, kc, vc = pl.pallas_call(
        functools.partial(_squeeze_batch_kernel, seq_block=seq_block),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1,), lambda b: (b,), memory_space=pltpu.SMEM),
            batch_block(H, 1, D),
            batch_block(H, 1, D),
            batch_block(H, 1, D),
            batch_block(H, S, D),
            batch_block(H, S, D),
        ],
        out_specs=(
            batch_block(H, 1, D),
            batch_block(H, S, D),
            batch_block(H, S, D),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
            jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
        ),
        input_output_aliases={4: 1, 5: 2},
    )(pos, q, k, v, k_cache, v_cache)
    return out, kc, vc


def _squeeze_batch_kernel(pos_ref, q_ref, k_ref, v_ref, kc_ref, vc_ref,
                          out_ref, kco_ref, vco_ref, *, seq_block):
    # Leading block dim is the (size-1) batch slot; drop it via .at[0].
    _decode_attn_kernel(
        pos_ref, q_ref.at[0], k_ref.at[0], v_ref.at[0],
        kc_ref.at[0], vc_ref.at[0],
        out_ref.at[0], kco_ref.at[0], vco_ref.at[0],
        seq_block=seq_block,
    )
