"""Paged flash-decode attention (vLLM-style block tables, TPU-native).

The reference manages KV state as heap-allocated contiguous clones
(reference src/core/graph.cc:578-633 cloneKV/free_heap); a serving engine
doing continuous batching fragments under that scheme. Here the KV cache is
a pool of fixed-size PAGES plus a per-slot block table — the allocation
granularity the BASELINE north star asks for ("paged + INT8 KV cache").

TPU design points:
* pages are [n_pages, Hkv, page_size, D] so one (kv-head, page) tile is a
  contiguous [page_size, D] VMEM block — page_size is the flash seq_block;
* the block table rides in SMEM via PrefetchScalarGridSpec and drives the
  k/v BlockSpec index_maps — the indirection costs nothing at compute time
  (Mosaic resolves the page id while prefetching the next block);
* all shapes static: grid covers max_pages_per_seq; pages past the causal
  frontier are skipped via @pl.when (their DMAs still issue — the price of
  a static grid — but pos-masking keeps the math exact).

jnp reference: paged_decode_ref (oracle + CPU path).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

from infinitensor_tpu.utils.platform import (
    is_tpu, pallas_interpret, use_pallas,
)


def gather_pages(pages, block_table):
    """[N, Hkv, P, D], [B, MP] -> dense [B, Hkv, MP*P, D]."""
    g = pages[block_table]                      # [B, MP, Hkv, P, D]
    B, MP, Hkv, P, D = g.shape
    return jnp.moveaxis(g, 1, 2).reshape(B, Hkv, MP * P, D)


def paged_append(k_pages, v_pages, k, v, block_table, pos):
    """Write new k/v [B, Hkv, 1, D] at per-slot positions.

    block_table [B, MP] int32; pos [B] int32 (the slot's current length).
    Returns updated (k_pages, v_pages); in-place when donated."""
    P = k_pages.shape[2]
    page_ids = jnp.take_along_axis(
        block_table, (pos // P)[:, None], axis=1)[:, 0]       # [B]
    offs = pos % P                                            # [B]

    def upd(pages, new):
        # scatter one row per batch: pages[page_ids[b], :, offs[b], :] = new
        def one(pages, pid, off, row):
            return jax.lax.dynamic_update_slice(
                pages, row.astype(pages.dtype)[None],
                (pid, 0, off, 0))
        def body(i, pgs):
            return one(pgs, page_ids[i], offs[i], new[i, :, 0, :][:, None])
        return jax.lax.fori_loop(0, new.shape[0], body, pages)

    return upd(k_pages, k), upd(v_pages, v)


def gather_scale_pages(scale_pages, block_table):
    """[N, Hkv, P], [B, MP] -> dense [B, Hkv, MP*P]."""
    g = scale_pages[block_table]                # [B, MP, Hkv, P]
    B, MP, Hkv, P = g.shape
    return jnp.moveaxis(g, 1, 2).reshape(B, Hkv, MP * P)


def paged_append_q8(k_pages, v_pages, ks_pages, vs_pages, k, v,
                    block_table, pos):
    """INT8 variant of paged_append: quantize each new K/V row
    (per-(b, head) symmetric scale) and scatter the int8 row + its scale
    into the page pool. ks/vs_pages [N, Hkv, P] f32."""
    from infinitensor_tpu.kernels.attention import quantize_kv_row

    P = k_pages.shape[2]
    page_ids = jnp.take_along_axis(
        block_table, (pos // P)[:, None], axis=1)[:, 0]       # [B]
    offs = pos % P                                            # [B]
    kq, ks = quantize_kv_row(k)                               # [B,Hkv,1,D]/[B,Hkv,1]
    vq, vs = quantize_kv_row(v)

    def upd(pages, new):
        def body(i, pgs):
            return jax.lax.dynamic_update_slice(
                pgs, new[i, :, 0, :][:, None].astype(pgs.dtype)[None],
                (page_ids[i], 0, offs[i], 0))
        return jax.lax.fori_loop(0, new.shape[0], body, pages)

    def upd_scale(pages, new):
        def body(i, pgs):
            return jax.lax.dynamic_update_slice(
                pgs, new[i].astype(pgs.dtype)[None],      # [1, Hkv, 1]
                (page_ids[i], 0, offs[i]))
        return jax.lax.fori_loop(0, new.shape[0], body, pages)

    return (upd(k_pages, kq), upd(v_pages, vq),
            upd_scale(ks_pages, ks), upd_scale(vs_pages, vs))


def paged_decode_q8_ref(q, k_pages, v_pages, ks_pages, vs_pages,
                        block_table, pos):
    """Oracle for INT8 paged decode: gather + dequant + masked GQA."""
    kd = (gather_pages(k_pages, block_table).astype(jnp.float32)
          * gather_scale_pages(ks_pages, block_table)[..., None])
    vd = (gather_pages(v_pages, block_table).astype(jnp.float32)
          * gather_scale_pages(vs_pages, block_table)[..., None])
    B, H, _, D = q.shape
    Hkv = k_pages.shape[1]
    rep = H // Hkv
    S = kd.shape[2]
    qf = q.astype(jnp.float32).reshape(B, Hkv, rep, D)
    s = jnp.einsum("bgrd,bgsd->bgrs", qf, kd) / math.sqrt(D)
    mask = jnp.arange(S)[None, None, None, :] <= pos[:, None, None, None]
    s = jnp.where(mask, s, -jnp.inf)
    p = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum("bgrs,bgsd->bgrd", p, vd)
    return out.reshape(B, H, 1, D).astype(q.dtype)


def paged_decode_ref(q, k_pages, v_pages, block_table, pos):
    """Oracle: gather pages to dense and run masked GQA attention.

    q [B, H, 1, D]; pages [N, Hkv, P, D]; block_table [B, MP]; pos [B]
    (position of the CURRENT token, i.e. attend to [0, pos]).
    Returns out [B, H, 1, D]."""
    B, H, _, D = q.shape
    Hkv = k_pages.shape[1]
    rep = H // Hkv
    kd = gather_pages(k_pages, block_table)     # [B, Hkv, S, D]
    vd = gather_pages(v_pages, block_table)
    S = kd.shape[2]
    scale = 1.0 / math.sqrt(D)
    qf = q.astype(jnp.float32).reshape(B, Hkv, rep, D)
    s = jnp.einsum("bgrd,bgsd->bgrs", qf, kd.astype(jnp.float32)) * scale
    mask = jnp.arange(S)[None, None, None, :] <= pos[:, None, None, None]
    s = jnp.where(mask, s, -jnp.inf)
    p = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum("bgrs,bgsd->bgrd", p, vd.astype(jnp.float32))
    return out.reshape(B, H, 1, D).astype(q.dtype)


def _paged_kernel(table_ref, pos_ref, q_ref, k_ref, v_ref, o_ref,
                  m_ref, l_ref, acc_ref, *, page, rep):
    import jax.experimental.pallas as pl

    b = pl.program_id(0)
    p_idx = pl.program_id(2)
    pos = pos_ref[b]
    start = p_idx * page

    @pl.when(p_idx == 0)
    def _():
        m_ref[:, :] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[:, :] = jnp.zeros_like(l_ref)
        acc_ref[:, :] = jnp.zeros_like(acc_ref)

    @pl.when(start <= pos)
    def _():
        D = q_ref.shape[-1]
        q = q_ref[:, :].astype(jnp.float32)                  # [rep, D]
        kb = k_ref[:, :].astype(jnp.float32)                 # [page, D]
        vb = v_ref[:, :].astype(jnp.float32)
        scale = 1.0 / math.sqrt(D)
        s = jax.lax.dot_general(q, kb, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        idx = start + jax.lax.broadcasted_iota(jnp.int32, (1, page), 1)
        s = jnp.where(idx <= pos, s, -jnp.inf)
        m_prev = m_ref[:, :]
        m_cur = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m_prev - m_cur)
        p = jnp.exp(s - m_cur)
        l_ref[:, :] = l_ref[:, :] * alpha + jnp.sum(p, -1, keepdims=True)
        m_ref[:, :] = m_cur
        pv = jax.lax.dot_general(p, vb, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        acc_ref[:, :] = acc_ref[:, :] * alpha + pv

    @pl.when(p_idx == pl.num_programs(2) - 1)
    def _():
        o_ref[:, :] = (acc_ref[:, :] / l_ref[:, :]).astype(o_ref.dtype)


def _paged_q8_kernel(table_ref, pos_ref, q_ref, k_ref, v_ref, ks_ref,
                     vs_ref, o_ref, m_ref, l_ref, acc_ref, *, page, rep):
    """INT8 paged decode: like _paged_kernel but K/V tiles are int8 and
    the per-row scales (blocks [1, page]) fold into the score matrix
    columns / probability matrix (see flash_decode_q8)."""
    import jax.experimental.pallas as pl

    b = pl.program_id(0)
    p_idx = pl.program_id(2)
    pos = pos_ref[b]
    start = p_idx * page

    @pl.when(p_idx == 0)
    def _():
        m_ref[:, :] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[:, :] = jnp.zeros_like(l_ref)
        acc_ref[:, :] = jnp.zeros_like(acc_ref)

    @pl.when(start <= pos)
    def _():
        D = q_ref.shape[-1]
        q = q_ref[:, :].astype(jnp.float32)                  # [rep, D]
        kb = k_ref[:, :].astype(jnp.float32)                 # [page, D] int8
        vb = v_ref[:, :].astype(jnp.float32)
        scale = 1.0 / math.sqrt(D)
        s = jax.lax.dot_general(q, kb, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s = s * (ks_ref[:, :] * scale)
        idx = start + jax.lax.broadcasted_iota(jnp.int32, (1, page), 1)
        s = jnp.where(idx <= pos, s, -jnp.inf)
        m_prev = m_ref[:, :]
        m_cur = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m_prev - m_cur)
        p = jnp.exp(s - m_cur)
        l_ref[:, :] = l_ref[:, :] * alpha + jnp.sum(p, -1, keepdims=True)
        m_ref[:, :] = m_cur
        pv = jax.lax.dot_general(p * vs_ref[:, :], vb,
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        acc_ref[:, :] = acc_ref[:, :] * alpha + pv

    @pl.when(p_idx == pl.num_programs(2) - 1)
    def _():
        o_ref[:, :] = (acc_ref[:, :] / l_ref[:, :]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def paged_flash_decode_q8(q, k_pages, v_pages, ks_pages, vs_pages,
                          block_table, pos, *, interpret: bool = False):
    """INT8 paged Pallas decode. q [B, H, 1, D]; pages int8
    [N, Hkv, P, D]; scale pages f32 [N, Hkv, P]; block_table [B, MP];
    pos [B]. Returns [B, H, 1, D]. ~2x less page-pool HBM traffic than
    the bf16 pool at D=128 (D+4 vs 2D bytes per cached row)."""
    if not use_pallas(interpret):
        return paged_decode_q8_ref(q, k_pages, v_pages, ks_pages, vs_pages,
                                   block_table, pos)
    interpret = interpret or (pallas_interpret() and not is_tpu())
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, _, D = q.shape
    N, Hkv, P, Dk = k_pages.shape
    MP = block_table.shape[1]
    rep = H // Hkv
    qg = q.reshape(B, Hkv, rep, D)
    ks4 = ks_pages.astype(jnp.float32).reshape(N, Hkv, 1, P)
    vs4 = vs_pages.astype(jnp.float32).reshape(N, Hkv, 1, P)
    grid = (B, Hkv, MP)

    def k_index(b, h, p, table_ref, pos_ref):
        return (table_ref[b, p], h, 0, 0)

    out = pl.pallas_call(
        functools.partial(_paged_q8_kernel, page=P, rep=rep),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,      # block_table, pos (SMEM)
            grid=grid,
            in_specs=[
                pl.BlockSpec((None, None, rep, D),
                             lambda b, h, p, t, ps: (b, h, 0, 0)),
                pl.BlockSpec((None, None, P, D), k_index),
                pl.BlockSpec((None, None, P, D), k_index),
                pl.BlockSpec((None, None, 1, P), k_index),
                pl.BlockSpec((None, None, 1, P), k_index),
            ],
            out_specs=pl.BlockSpec((None, None, rep, D),
                                   lambda b, h, p, t, ps: (b, h, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((rep, 1), jnp.float32),
                pltpu.VMEM((rep, 1), jnp.float32),
                pltpu.VMEM((rep, D), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, Hkv, rep, D), q.dtype),
        interpret=interpret,
    )(block_table.astype(jnp.int32), pos.astype(jnp.int32),
      qg, k_pages, v_pages, ks4, vs4)
    return out.reshape(B, H, 1, D)


@functools.partial(jax.jit, static_argnames=("interpret",))
def paged_flash_decode(q, k_pages, v_pages, block_table, pos, *,
                       interpret: bool = False):
    """Pallas paged decode. q [B, H, 1, D]; pages [N, Hkv, P, D];
    block_table [B, MP] int32 page ids; pos [B]. Returns [B, H, 1, D]."""
    if not use_pallas(interpret):
        return paged_decode_ref(q, k_pages, v_pages, block_table, pos)
    interpret = interpret or (pallas_interpret() and not is_tpu())
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, _, D = q.shape
    N, Hkv, P, Dk = k_pages.shape
    MP = block_table.shape[1]
    rep = H // Hkv
    qg = q.reshape(B, Hkv, rep, D)
    grid = (B, Hkv, MP)

    def k_index(b, h, p, table_ref, pos_ref):
        return (table_ref[b, p], h, 0, 0)

    out = pl.pallas_call(
        functools.partial(_paged_kernel, page=P, rep=rep),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,      # block_table, pos (SMEM)
            grid=grid,
            in_specs=[
                pl.BlockSpec((None, None, rep, D),
                             lambda b, h, p, t, ps: (b, h, 0, 0)),
                pl.BlockSpec((None, None, P, D), k_index),
                pl.BlockSpec((None, None, P, D), k_index),
            ],
            out_specs=pl.BlockSpec((None, None, rep, D),
                                   lambda b, h, p, t, ps: (b, h, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((rep, 1), jnp.float32),
                pltpu.VMEM((rep, 1), jnp.float32),
                pltpu.VMEM((rep, D), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, Hkv, rep, D), q.dtype),
        interpret=interpret,
    )(block_table.astype(jnp.int32), pos.astype(jnp.int32),
      qg, k_pages, v_pages)
    return out.reshape(B, H, 1, D)
