"""Decode attention with KV-cache append.

TPU-native redesign of the reference's fused decode kernel
(src/kernels/cuda/attention_kvcache.cu): the CUDA kernel appends k/v into the
cache in-kernel and runs a SEQ_UNIT-tiled online softmax for a single query
token. Here:

* the cache is a static-shape [B, H, S_max, D] buffer; the append is a
  dynamic_update_slice on a donated buffer (XLA writes the single row in
  place in HBM — no copy);
* attention is a flash-decode Pallas kernel: grid (B, H, S/blk) with the
  sequence dimension innermost, K/V blocks streamed HBM->VMEM by the Pallas
  pipeliner (double-buffered), online softmax state in VMEM scratch, and only
  2D dots (Mosaic has no batched-dot support).

Implementations:
  decode_attention_ref : pure jnp (oracle; what XLA fuses on its own)
  decode_attention     : cache append + Pallas flash-decode
  decode_attention_gqa : grouped-query wrapper used by the Llama models
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
from jax import lax

from infinitensor_tpu.utils.platform import (
    is_tpu, pallas_interpret, use_pallas,
)


def _normalize_pos(pos, batch):
    pos = jnp.asarray(pos).reshape(-1).astype(jnp.int32)
    if pos.shape[0] != batch:
        pos = jnp.broadcast_to(pos[:1], (batch,))
    return pos


def _append_kv(k_cache, v_cache, k, v, pos):
    """Write k/v [B, H, 1, D] at per-batch positions (in place when the
    caller donates the cache buffers)."""

    def upd(cache, new, p):
        return lax.dynamic_update_slice(cache, new, (0, p, 0))

    k_cache = jax.vmap(upd)(k_cache, k.astype(k_cache.dtype), pos)
    v_cache = jax.vmap(upd)(v_cache, v.astype(v_cache.dtype), pos)
    return k_cache, v_cache


def decode_attention_ref(k_cache, v_cache, q, k, v, pos):
    """Reference semantics; shapes:
    k_cache/v_cache: [B, H, S, D]; q/k/v: [B, H, 1, D]; pos: [] or [B].

    Returns (out [B,H,1,D], k_cache', v_cache').
    """
    B, H, S, D = k_cache.shape
    pos = _normalize_pos(pos, B)
    k_cache, v_cache = _append_kv(k_cache, v_cache, k, v, pos)
    scale = 1.0 / math.sqrt(D)
    scores = jnp.einsum(
        "bhqd,bhsd->bhqs", q.astype(jnp.float32), k_cache.astype(jnp.float32)
    ) * scale
    mask = jnp.arange(S)[None, None, None, :] <= pos[:, None, None, None]
    scores = jnp.where(mask, scores, -jnp.inf)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhqs,bhsd->bhqd", probs, v_cache.astype(jnp.float32))
    return out.astype(q.dtype), k_cache, v_cache


def quantize_kv_row(x):
    """Per-(batch, head) symmetric int8 quantization of one K/V row
    [B, Hkv, 1, D] -> (int8 row, scale [B, Hkv, 1])."""
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    scale = jnp.maximum(absmax / 127.0, 1e-8)
    q = jnp.round(x.astype(jnp.float32) / scale[..., None])
    return jnp.clip(q, -127, 127).astype(jnp.int8), scale


def decode_attention_gqa_q8(k_cache, v_cache, k_scale, v_scale, q, k, v,
                            pos):
    """INT8-KV-cache decode attention: caches int8 [B, Hkv, S, D] with
    per-(b, h, s) scales [B, Hkv, S]; dequantized on read (half the cache
    HBM traffic of bf16 — the long-context decode win). On TPU the read
    side is the Pallas flash_decode_q8 kernel (scales folded into the
    score/prob matrices post-dot, causal-frontier DMA clamp); this jnp
    body is the CPU fallback and test oracle.
    Returns (out, k_cache', v_cache', k_scale', v_scale')."""
    B, Hkv, S, D = k_cache.shape
    H = q.shape[1]
    pos = _normalize_pos(pos, B)
    kq, ks = quantize_kv_row(k)
    vq, vs = quantize_kv_row(v)
    k_cache, v_cache = _append_kv(k_cache, v_cache, kq, vq, pos)

    def upd_scale(cache, new, p):
        return lax.dynamic_update_slice(cache, new, (0, p))

    k_scale = jax.vmap(upd_scale)(k_scale, ks.astype(k_scale.dtype), pos)
    v_scale = jax.vmap(upd_scale)(v_scale, vs.astype(v_scale.dtype), pos)

    if use_pallas():
        out = flash_decode_q8(q, k_cache, v_cache, k_scale, v_scale, pos)
        return out, k_cache, v_cache, k_scale, v_scale

    rep = H // Hkv
    scale = 1.0 / math.sqrt(D)
    qf = q.astype(jnp.float32).reshape(B, Hkv, rep, D)
    kf = k_cache.astype(jnp.float32) * k_scale[..., None]
    scores = jnp.einsum("bgrd,bgsd->bgrs", qf, kf) * scale
    mask = jnp.arange(S)[None, None, None, :] <= pos[:, None, None, None]
    scores = jnp.where(mask, scores, -jnp.inf)
    p = jax.nn.softmax(scores, axis=-1)
    vf = v_cache.astype(jnp.float32) * v_scale[..., None]
    out = jnp.einsum("bgrs,bgsd->bgrd", p, vf)
    return (out.reshape(B, H, 1, D).astype(q.dtype), k_cache, v_cache,
            k_scale, v_scale)


def decode_attention_gqa(k_cache, v_cache, q, k, v, pos):
    """Grouped-query decode attention with cache append.

    k_cache/v_cache: [B, Hkv, S, D]; q: [B, H, 1, D] (H = Hkv * rep);
    k/v: [B, Hkv, 1, D]; pos: [B] int32.
    Returns (out [B, H, 1, D], k_cache', v_cache').
    """
    B, Hkv, S, D = k_cache.shape
    H = q.shape[1]
    pos = _normalize_pos(pos, B)
    if use_pallas():
        k_cache, v_cache = _append_kv(k_cache, v_cache, k, v, pos)
        out = flash_decode(q, k_cache, v_cache, pos)
        return out, k_cache, v_cache
    k_cache, v_cache = _append_kv(k_cache, v_cache, k, v, pos)
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


def decode_attention(k_cache, v_cache, q, k, v, pos):
    """MHA decode (H == Hkv): append + flash-decode kernel."""
    B = k_cache.shape[0]
    pos = _normalize_pos(pos, B)
    if not use_pallas():
        return decode_attention_ref(k_cache, v_cache, q, k, v, pos)
    k_cache, v_cache = _append_kv(k_cache, v_cache, k, v, pos)
    out = flash_decode(q, k_cache, v_cache, pos)
    return out, k_cache, v_cache


# ---------------------------------------------------------------------------
# Pallas flash-decode kernel
# ---------------------------------------------------------------------------


def _pick_seq_block(seq_block: int, S: int) -> int:
    """Largest divisor of S that is <= seq_block AND a multiple of 128
    (Mosaic block-shape rule for the [1, seq_block] scale rows). gcd
    collapsed S=2176 vs 2048 to 128-row DMAs (~5 ms/step regression);
    when only tiny divisors exist, one whole-S block wins (the sweep
    shows big DMAs dominate elision, docs/DECODE_BUDGET.json)."""
    seq_block = min(seq_block, S)
    if S % seq_block == 0 and (seq_block % 128 == 0 or seq_block == S):
        return seq_block
    k = -(-S // seq_block)
    while k <= S and (S % k or (S // k) % 128):
        k += 1
    cand = S // k if k <= S else 0
    if cand >= 512:
        return cand
    # Single whole-S block beats tiny DMAs and is always Mosaic-valid
    # (block dim == array dim) — but only while [S, D] bf16 fits the
    # ~4 MB-per-buffered-operand VMEM budget; past that, take the largest
    # 128-multiple divisor even if small.
    if S <= 8192 or cand == 0:
        return S
    return cand


def _resolve_hb(head_block: int, Hkv: int) -> int:
    import os
    if head_block == 0:
        # Measured on v5e (docs/DECODE_BUDGET.json flash sweep): hb=1 at
        # seq_block=2048 streams 664 GB/s; every head-blocked / smaller-
        # block combination is SLOWER (blk512:hb8 498, blk256:hb32 370) —
        # the per-(head, block) DMA must stay large, and the one-head grid
        # pipelines fine. Default stays 1; the knob remains for tuning.
        head_block = int(os.environ.get("INFINITPU_FLASH_HB", "1"))
    head_block = max(1, min(head_block, Hkv))
    while Hkv % head_block:
        head_block -= 1
    return head_block


def _env_seq_block(seq_block: int) -> int:
    """Resolve the INFINITPU_FLASH_SEQBLK tuning override OUTSIDE any jit:
    the jit trace cache keys only on shapes + static args, so an env read
    inside the traced body would silently pin the value seen at first
    trace (advisor round-4 finding). Callers that don't thread the knob
    (serving engines) get the override applied here, for BOTH the bf16 and
    int8-KV kernels, re-read on every call."""
    if seq_block == 2048 and os.environ.get("INFINITPU_FLASH_SEQBLK"):
        return int(os.environ["INFINITPU_FLASH_SEQBLK"])
    return seq_block


def flash_decode(q, k_cache, v_cache, pos, *, seq_block: int = 2048,
                 interpret: bool = False, head_block: int = 0):
    return _flash_decode_jit(q, k_cache, v_cache, pos,
                             seq_block=_env_seq_block(seq_block),
                             interpret=interpret, head_block=head_block)


@functools.partial(jax.jit,
                   static_argnames=("seq_block", "interpret", "head_block"))
def _flash_decode_jit(q, k_cache, v_cache, pos, *, seq_block: int = 2048,
                      interpret: bool = False, head_block: int = 0):
    """q [B, H, 1, D], caches [B, Hkv, S, D] (already appended), pos [B].
    Returns [B, H, 1, D]. H must be a multiple of Hkv (GQA).

    K/V blocks beyond the causal frontier are never read from HBM: pos is a
    scalar-prefetch operand and the K/V index maps clamp the sequence-block
    index at ``pos // seq_block``, so the pipeliner sees a repeated block
    index and elides the DMA (the compute for those blocks is already
    skipped by ``@pl.when``). Without this, decoding at position p in a
    padded S_max cache streams S_max rows instead of p — 2x the traffic at
    half-full (the reference kernel tiles only over the live sequence,
    attention_kvcache.cu:8-60; this recovers that property for static
    shapes).

    head_block (env INFINITPU_FLASH_HB, default 1): kv heads per grid
    step. Per-head decode compute is tiny ([rep, D] x [D, blk]), so a
    one-head grid pays its fixed per-step cost ~Hkv x S/blk times;
    blocking heads amortizes it and lets seq_block shrink (better
    frontier elision) without step-count blowup. Round-2's "2048 blocks
    beat 4x512" measurement was an hb=1 artifact of exactly that
    overhead; tuned_flash_decode (runtime/tuner.py) sweeps the knobs."""
    interpret = interpret or (pallas_interpret() and not is_tpu())
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, _, D = q.shape
    Bk, Hkv, S, Dk = k_cache.shape
    rep = H // Hkv
    seq_block = _pick_seq_block(seq_block, S)
    hb = _resolve_hb(head_block, Hkv)
    grid = (B, Hkv // hb, S // seq_block)

    qg = q.reshape(B, Hkv, rep, D)

    def kv_index(b, h, s, pos_ref):
        last = pos_ref[b] // seq_block
        return (b, h, jnp.minimum(s, last), 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, hb, rep, D),
                         lambda b, h, s, pos_ref: (b, h, 0, 0)),
            pl.BlockSpec((None, hb, seq_block, D), kv_index),
            pl.BlockSpec((None, hb, seq_block, D), kv_index),
        ],
        out_specs=pl.BlockSpec((None, hb, rep, D),
                               lambda b, h, s, pos_ref: (b, h, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((hb * rep, 1), jnp.float32),
            pltpu.VMEM((hb * rep, 1), jnp.float32),
            pltpu.VMEM((hb * rep, D), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_flash_decode_hb_kernel, seq_block=seq_block,
                          rep=rep, hb=hb),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hkv, rep, D), q.dtype),
        interpret=interpret,
    )(pos, qg, k_cache, v_cache)
    return out.reshape(B, H, 1, D)


def _flash_decode_hb_kernel(pos_ref, q_ref, k_ref, v_ref, o_ref,
                            m_ref, l_ref, acc_ref, *, seq_block, rep, hb):
    """Head-blocked flash decode: each grid step processes `hb` kv heads
    (static in-kernel loop of 2D dots) instead of one. At decode shapes
    the per-head compute is tiny ([rep<=8, D] x [D, blk]), so the
    fixed per-grid-step cost dominates a one-head-per-step grid; blocking
    heads amortizes it hb-fold and enables smaller seq blocks (better
    causal-frontier DMA elision) at the same step count."""
    import jax.experimental.pallas as pl

    s_idx = pl.program_id(2)
    pos = pos_ref[pl.program_id(0)]
    start = s_idx * seq_block

    @pl.when(s_idx == 0)
    def _():
        m_ref[:, :] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[:, :] = jnp.zeros_like(l_ref)
        acc_ref[:, :] = jnp.zeros_like(acc_ref)

    @pl.when(start <= pos)
    def _():
        D = q_ref.shape[-1]
        scale = 1.0 / math.sqrt(D)
        idx = start + jax.lax.broadcasted_iota(jnp.int32, (1, seq_block), 1)
        live = idx <= pos
        for h in range(hb):
            q = q_ref[h].astype(jnp.float32)              # [rep, D]
            kb = k_ref[h].astype(jnp.float32)             # [blk, D]
            vb = v_ref[h].astype(jnp.float32)
            s = jax.lax.dot_general(q, kb, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            s = jnp.where(live, s * scale, -jnp.inf)      # [rep, blk]
            r0, r1 = h * rep, (h + 1) * rep
            m_prev = m_ref[r0:r1, :]
            m_cur = jnp.maximum(m_prev, jnp.max(s, -1, keepdims=True))
            alpha = jnp.exp(m_prev - m_cur)
            p = jnp.exp(s - m_cur)
            l_ref[r0:r1, :] = l_ref[r0:r1, :] * alpha \
                + jnp.sum(p, -1, keepdims=True)
            m_ref[r0:r1, :] = m_cur
            pv = jax.lax.dot_general(p, vb, (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            acc_ref[r0:r1, :] = acc_ref[r0:r1, :] * alpha + pv

    @pl.when(s_idx == pl.num_programs(2) - 1)
    def _():
        o_ref[:, :, :] = (acc_ref[:, :] / l_ref[:, :]).reshape(
            o_ref.shape).astype(o_ref.dtype)


def _flash_decode_q8_hb_kernel(pos_ref, q_ref, k_ref, v_ref, ks_ref,
                               vs_ref, o_ref, m_ref, l_ref, acc_ref, *,
                               seq_block, rep, hb):
    """Head-blocked INT8-KV flash decode (see _flash_decode_hb_kernel;
    scales folded algebraically as in _flash_decode_q8_kernel)."""
    import jax.experimental.pallas as pl

    s_idx = pl.program_id(2)
    pos = pos_ref[pl.program_id(0)]
    start = s_idx * seq_block

    @pl.when(s_idx == 0)
    def _():
        m_ref[:, :] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[:, :] = jnp.zeros_like(l_ref)
        acc_ref[:, :] = jnp.zeros_like(acc_ref)

    @pl.when(start <= pos)
    def _():
        D = q_ref.shape[-1]
        scale = 1.0 / math.sqrt(D)
        idx = start + jax.lax.broadcasted_iota(jnp.int32, (1, seq_block), 1)
        live = idx <= pos
        for h in range(hb):
            q = q_ref[h].astype(jnp.float32)              # [rep, D]
            kb = k_ref[h].astype(jnp.float32)             # [blk, D] int8
            vb = v_ref[h].astype(jnp.float32)
            s = jax.lax.dot_general(q, kb, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            s = s * (ks_ref[h] * scale)                   # [1, blk] scales
            s = jnp.where(live, s, -jnp.inf)
            r0, r1 = h * rep, (h + 1) * rep
            m_prev = m_ref[r0:r1, :]
            m_cur = jnp.maximum(m_prev, jnp.max(s, -1, keepdims=True))
            alpha = jnp.exp(m_prev - m_cur)
            p = jnp.exp(s - m_cur)
            l_ref[r0:r1, :] = l_ref[r0:r1, :] * alpha \
                + jnp.sum(p, -1, keepdims=True)
            m_ref[r0:r1, :] = m_cur
            pv = jax.lax.dot_general(p * vs_ref[h], vb,
                                     (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            acc_ref[r0:r1, :] = acc_ref[r0:r1, :] * alpha + pv

    @pl.when(s_idx == pl.num_programs(2) - 1)
    def _():
        o_ref[:, :, :] = (acc_ref[:, :] / l_ref[:, :]).reshape(
            o_ref.shape).astype(o_ref.dtype)


def flash_decode_q8(q, k_cache, v_cache, k_scale, v_scale, pos, *,
                    seq_block: int = 2048, interpret: bool = False,
                    head_block: int = 0):
    return _flash_decode_q8_jit(q, k_cache, v_cache, k_scale, v_scale, pos,
                                seq_block=_env_seq_block(seq_block),
                                interpret=interpret, head_block=head_block)


@functools.partial(jax.jit,
                   static_argnames=("seq_block", "interpret", "head_block"))
def _flash_decode_q8_jit(q, k_cache, v_cache, k_scale, v_scale, pos, *,
                         seq_block: int = 2048, interpret: bool = False,
                         head_block: int = 0):
    """INT8-KV flash decode. q [B, H, 1, D]; caches int8 [B, Hkv, S, D]
    (already appended); scales f32 [B, Hkv, S]; pos [B]. Returns
    [B, H, 1, D]. Same causal-frontier DMA clamp as flash_decode: blocks
    past ``pos`` are never fetched from HBM. Reference semantics:
    attention_kvcache.cu:8-60 (+ the INT8 cache the reference lacks).
    Off-TPU (and not interpreting) falls back to the jnp dequant oracle."""
    interpret = interpret or (pallas_interpret() and not is_tpu())
    if not (interpret or is_tpu()):
        B, H, _, D = q.shape
        Bk, Hkv, S, Dk = k_cache.shape
        rep = H // Hkv
        qf = q.astype(jnp.float32).reshape(B, Hkv, rep, D)
        kf = k_cache.astype(jnp.float32) * k_scale[..., None]
        s = jnp.einsum("bgrd,bgsd->bgrs", qf, kf) / math.sqrt(D)
        mask = jnp.arange(S)[None, None, None, :] <= pos[:, None, None, None]
        s = jnp.where(mask, s, -jnp.inf)
        p = jax.nn.softmax(s, axis=-1)
        vf = v_cache.astype(jnp.float32) * v_scale[..., None]
        out = jnp.einsum("bgrs,bgsd->bgrd", p, vf)
        return out.reshape(B, H, 1, D).astype(q.dtype)
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, _, D = q.shape
    Bk, Hkv, S, Dk = k_cache.shape
    rep = H // Hkv
    seq_block = _pick_seq_block(seq_block, S)
    hb = _resolve_hb(head_block, Hkv)
    grid = (B, Hkv // hb, S // seq_block)

    qg = q.reshape(B, Hkv, rep, D)
    ks4 = k_scale.astype(jnp.float32).reshape(B, Hkv, 1, S)
    vs4 = v_scale.astype(jnp.float32).reshape(B, Hkv, 1, S)

    def kv_index(b, h, s, pos_ref):
        last = pos_ref[b] // seq_block
        return (b, h, jnp.minimum(s, last), 0)

    def scale_index(b, h, s, pos_ref):
        last = pos_ref[b] // seq_block
        return (b, h, 0, jnp.minimum(s, last))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, hb, rep, D),
                         lambda b, h, s, pos_ref: (b, h, 0, 0)),
            pl.BlockSpec((None, hb, seq_block, D), kv_index),
            pl.BlockSpec((None, hb, seq_block, D), kv_index),
            pl.BlockSpec((None, hb, 1, seq_block), scale_index),
            pl.BlockSpec((None, hb, 1, seq_block), scale_index),
        ],
        out_specs=pl.BlockSpec((None, hb, rep, D),
                               lambda b, h, s, pos_ref: (b, h, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((hb * rep, 1), jnp.float32),
            pltpu.VMEM((hb * rep, 1), jnp.float32),
            pltpu.VMEM((hb * rep, D), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_flash_decode_q8_hb_kernel, seq_block=seq_block,
                          rep=rep, hb=hb),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hkv, rep, D), q.dtype),
        interpret=interpret,
    )(pos, qg, k_cache, v_cache, ks4, vs4)
    return out.reshape(B, H, 1, D)
