"""Blockwise (flash) attention Pallas kernel for prefill.

The prefill counterpart of flash_decode: causal attention computed in
[block_q x block_k] tiles with online softmax, never materializing the
[S, S] score matrix. Grid (B*H, S/bq, S/bk) with the key dimension innermost;
softmax state in VMEM scratch; 2D dots only (Mosaic constraint).

jnp reference: mha_ref (oracle + CPU path).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax import lax

from infinitensor_tpu.utils.platform import (
    is_tpu, pallas_interpret, use_pallas)


def mha_ref(q, k, v, causal: bool = True):
    """q/k/v [B, H, S, D] -> [B, H, S, D] (fp32 accumulation)."""
    B, H, S, D = q.shape
    scores = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                        k.astype(jnp.float32)) / math.sqrt(D)
    if causal:
        mask = jnp.tril(jnp.ones((S, S), bool))
        scores = jnp.where(mask[None, None], scores, -jnp.inf)
    p = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32))
    return out.astype(q.dtype)


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref,
                  *, block_q, block_k, causal, scale):
    import jax.experimental.pallas as pl

    qi = pl.program_id(1)
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _():
        m_ref[:, :] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[:, :] = jnp.zeros_like(l_ref)
        acc_ref[:, :] = jnp.zeros_like(acc_ref)

    run = (not causal) or (ki * block_k <= qi * block_q + block_q - 1)

    @pl.when(run)
    def _():
        q = q_ref[:, :].astype(jnp.float32)          # [bq, D]
        kb = k_ref[:, :].astype(jnp.float32)         # [bk, D]
        vb = v_ref[:, :].astype(jnp.float32)         # [bk, D]
        s = lax.dot_general(q, kb, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
        if causal:
            rows = qi * block_q + lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0)
            cols = ki * block_k + lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1)
            s = jnp.where(rows >= cols, s, -jnp.inf)
        m_prev = m_ref[:, :]
        m_cur = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        # rows with no valid key yet keep m=-inf; protect exp
        m_safe = jnp.where(jnp.isfinite(m_cur), m_cur, 0.0)
        alpha = jnp.where(jnp.isfinite(m_prev), jnp.exp(m_prev - m_safe), 0.0)
        p = jnp.where(jnp.isfinite(s), jnp.exp(s - m_safe), 0.0)
        l_ref[:, :] = l_ref[:, :] * alpha + jnp.sum(p, -1, keepdims=True)
        m_ref[:, :] = m_cur
        acc_ref[:, :] = acc_ref[:, :] * alpha + lax.dot_general(
            p, vb, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(ki == pl.num_programs(2) - 1)
    def _():
        l = jnp.maximum(l_ref[:, :], 1e-30)
        o_ref[:, :] = (acc_ref[:, :] / l).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("causal", "block_q", "block_k",
                                              "interpret"))
def flash_attention(q, k, v, causal: bool = True, block_q: int = 256,
                    block_k: int = 256, interpret: bool = False):
    """q/k/v [B, H, S, D] -> [B, H, S, D]."""
    if not use_pallas(interpret):
        return mha_ref(q, k, v, causal)
    # the env toggle must never put the REAL chip under the interpreter
    # (a stale INFINITPU_PALLAS_INTERPRET=1 from CPU CI would look like a
    # tunnel hang) — same guard as every other kernel
    interpret = interpret or (pallas_interpret() and not is_tpu())
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, S, D = q.shape
    block_q = min(block_q, S)
    block_k = min(block_k, S)
    if S % block_q or S % block_k:
        return mha_ref(q, k, v, causal)
    qf = q.reshape(B * H, S, D)
    kf = k.reshape(B * H, S, D)
    vf = v.reshape(B * H, S, D)
    grid = (B * H, S // block_q, S // block_k)
    scale = 1.0 / math.sqrt(D)
    out = pl.pallas_call(
        functools.partial(_flash_kernel, block_q=block_q, block_k=block_k,
                          causal=causal, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, block_q, D), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((None, block_k, D), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((None, block_k, D), lambda b, i, j: (b, j, 0)),
        ],
        out_specs=pl.BlockSpec((None, block_q, D), lambda b, i, j: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((B * H, S, D), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, D), jnp.float32),
        ],
        interpret=interpret,
    )(qf, kf, vf)
    return out.reshape(B, H, S, D)
