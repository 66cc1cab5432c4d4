"""Fused weight-only dequant + matmul Pallas kernel.

The decode-time hot op of quantized serving (BASELINE north star: >=85% of
dequant+matmul roofline). Decode matmuls are memory-bound on the *weights*:
activations are [B<=32, din] but weights are [din, dout] — the kernel streams
int8/int4 weight tiles HBM->VMEM exactly once, dequantizes in-registers, and
feeds the MXU.

Structure: grid over output tiles; the packed weight tile [din, bn] sits in
VMEM (pipeliner double-buffers it across grid steps) and a *static* Python
loop dequantizes chunk-by-chunk — chunking bounds the fp32/int32 dequant
intermediates (int4's unpack needs int32: Mosaic has no int8 vector shifts)
while static slices sidestep Mosaic's block divisibility rules for odd
group/dim combinations.

jnp reference: quant_matmul_ref (oracle on CPU).
"""

from __future__ import annotations

import functools
import json
import math
import os
from typing import Optional

import jax
import jax.numpy as jnp

from infinitensor_tpu.utils.platform import (
    is_tpu, pallas_interpret, use_pallas,
)

from infinitensor_tpu.quant.weight_only import (
    QuantizedLinear, dequantize_weight,
)


def quant_matmul_ref(x, q: QuantizedLinear):
    w = dequantize_weight(q, dtype=x.dtype)
    return jnp.matmul(x, w, preferred_element_type=jnp.float32).astype(x.dtype)


def _kernel(x_ref, qw_ref, sc_ref, o_ref, *, bits, group_size, chunk):
    bn = qw_ref.shape[1]
    acc = jnp.zeros((x_ref.shape[0], bn), jnp.float32)

    def dequant_dot(acc, qc_i32, x_cols, sc):
        ng_c = qc_i32.shape[0] // group_size
        wf = qc_i32.astype(jnp.float32).reshape(ng_c, group_size, bn)
        wf = wf * sc.reshape(ng_c, 1, bn)
        w = wf.reshape(qc_i32.shape[0], bn).astype(jnp.bfloat16)
        return acc + jnp.dot(x_cols, w, preferred_element_type=jnp.float32)

    if bits == 8:
        din = qw_ref.shape[0]
        ng_c = chunk // group_size
        for c in range(din // chunk):
            qc = qw_ref[c * chunk:(c + 1) * chunk, :].astype(jnp.int32)
            sc = sc_ref[c * ng_c:(c + 1) * ng_c, :]
            acc = dequant_dot(acc, qc, x_ref[:, c * chunk:(c + 1) * chunk],
                              sc)
    else:
        # split-half int4 (quant/weight_only.py): packed row i holds
        # w[i] (low nibble) and w[i + half] (high nibble), so each packed
        # chunk dequantizes into two CONTIGUOUS row blocks -> two MXU dots,
        # no sublane interleave. Sign extension = two arithmetic shifts.
        half = qw_ref.shape[0]          # = din // 2 packed rows
        ng_half = half // group_size    # scale groups per half
        ng_c = chunk // group_size
        for c in range(half // chunk):
            u = qw_ref[c * chunk:(c + 1) * chunk, :].astype(jnp.int32)
            lo = (u & 15) - 8            # offset-binary low nibble
            hi = (u << 24) >> 28
            sc_lo = sc_ref[c * ng_c:(c + 1) * ng_c, :]
            sc_hi = sc_ref[ng_half + c * ng_c:ng_half + (c + 1) * ng_c, :]
            acc = dequant_dot(acc, lo, x_ref[:, c * chunk:(c + 1) * chunk],
                              sc_lo)
            acc = dequant_dot(
                acc, hi, x_ref[:, half + c * chunk:half + (c + 1) * chunk],
                sc_hi)
    o_ref[:, :] = acc.astype(o_ref.dtype)


def _kernel_group_norm(x_ref, nw_ref, qw_ref, sc_ref, o_ref, *, bits,
                       group_size, eps):
    """Group-dot kernel with the input RMSNorm fused in: x is the RAW
    residual stream; the kernel normalizes it in VMEM before the dots.
    Saves a standalone norm kernel (+ its HBM round trip and launch gap)
    per matmul in the serial decode chain — XLA cannot fuse elementwise
    producers into a Pallas custom call."""
    x32 = x_ref[:, :].astype(jnp.float32)
    ms = jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
    xn = (x32 * jax.lax.rsqrt(ms + eps)).astype(jnp.bfloat16) \
        * nw_ref[:, :].astype(jnp.bfloat16)
    _group_dots(xn, qw_ref, sc_ref, o_ref, bits=bits,
                group_size=group_size)


def _kernel_group(x_ref, qw_ref, sc_ref, o_ref, *, bits, group_size):
    """Group-partial-dot variant: the per-group scale is applied to the
    [rows, bn] PARTIAL DOT instead of the [group, bn] weight tile.

    dot = sum_i x[i] w[i,o] = sum_g s[g,o] * sum_{i in g} x[i] q[i,o],
    so dequant needs only int->bf16 casts on the weight path (plus the
    int4 nibble shifts); the fp32 scale multiply — the VPU-bound part of
    the chunked kernel, ~2 extra full passes over every weight element —
    shrinks to one [rows, bn] multiply per group (rows<=8: ~1/16 of a
    pass). On the weight-streaming-bound decode path this moves the
    kernel from VPU-bound back to DMA-bound."""
    _group_dots(x_ref[:, :], qw_ref, sc_ref, o_ref, bits=bits,
                group_size=group_size)


def _group_dots(x, qw_ref, sc_ref, o_ref, *, bits, group_size):
    bn = qw_ref.shape[1]
    rows = x.shape[0]
    acc = jnp.zeros((rows, bn), jnp.float32)
    g = group_size

    if bits == 8:
        din = qw_ref.shape[0]
        for c in range(din // g):
            w = qw_ref[c * g:(c + 1) * g, :].astype(jnp.bfloat16)
            pd = jnp.dot(x[:, c * g:(c + 1) * g], w,
                         preferred_element_type=jnp.float32)
            acc = acc + pd * sc_ref[c, :].astype(jnp.float32)[None, :]
    else:
        # split-half int4: packed group c holds unpacked group c (low
        # nibbles) and group ng/2 + c (high nibbles) — scales line up as
        # sc[c] / sc[ng_half + c].
        #
        # Zero-wide-op nibble decode ("fuse4", round-4): a single int8
        # bitwise op + cast feeding a dot rides the MXU operand path for
        # free, while the old int32 widen+shift decode was the kernel's
        # bound (tools/qmm_explore.py: i32 path ~490-570 GB/s effective
        # vs 616-683 for this decode; pure cast+dot ceiling 810-1030).
        #   hi: (u & 0xF0) = 16*hi as int8 -> the /16 folds into the
        #       scale row ([1, bn] multiply)
        #   lo: (u & 15) ^ 8 = lo + 8     -> the -8 folds into a
        #       per-group dot-bias correction 8 * sum(xl)
        # Decode of the nibble VALUES is exact; the dot-bias correction is
        # f32-rounding-equivalent only (dot(x, lo+8) - 8*sum(x) rounds the
        # two reductions separately and can cancel when sum(x) is large
        # relative to x.lo), so oracle tests stay tolerance-based.
        half = qw_ref.shape[0]
        ng_half = half // g
        for c in range(ng_half):
            u8 = qw_ref[c * g:(c + 1) * g, :]
            hi16 = (u8 & jnp.int8(-16)).astype(jnp.bfloat16)   # 16*hi
            # low nibble is stored offset-binary (quantize_weight), so
            # one AND yields lo + 8 directly — no XOR
            lo_b = (u8 & jnp.int8(15)).astype(jnp.bfloat16)    # lo + 8
            xl = x[:, c * g:(c + 1) * g]
            pd_lo = jnp.dot(xl, lo_b,
                            preferred_element_type=jnp.float32)
            pd_hi = jnp.dot(x[:, half + c * g:half + (c + 1) * g], hi16,
                            preferred_element_type=jnp.float32)
            corr = jnp.sum(xl.astype(jnp.float32), axis=1,
                           keepdims=True) * jnp.float32(8.0)
            s_hi = sc_ref[ng_half + c, :].astype(jnp.float32) \
                * jnp.float32(0.0625)
            acc = acc + \
                (pd_lo - corr) * sc_ref[c, :].astype(
                    jnp.float32)[None, :] + pd_hi * s_hi[None, :]
    o_ref[:, :] = acc.astype(o_ref.dtype)



def _group_dots_slab(x, qw_ref, sc_ref, o_ref, *, group_size):
    """Slab kernel for PAIRED int4 quantization (quantize_weight
    paired=True: one scale row covers both split halves of a group):
    ONE 2g-deep MXU dot per packed group instead of fuse4's two g-deep
    dots, and ONE scale multiply instead of two. The /16 of the high
    nibble rides on the x half ([rows, g] multiply by 1/16 — exact in
    bf16), the +8 of the offset-binary low nibble stays a per-group
    dot-bias correction. Round-5 probe basis: i8slab rows of
    docs/QMM_EXPLORE.json (w_down 863 vs fuse4 715 GB/s, wo:1024 918
    vs 722)."""
    bn = qw_ref.shape[1]
    rows = x.shape[0]
    g = group_size
    half = qw_ref.shape[0]
    ngh = half // g
    acc = jnp.zeros((rows, bn), jnp.float32)
    for c in range(ngh):
        u8 = qw_ref[c * g:(c + 1) * g, :]
        lo8 = (u8 & jnp.int8(15)).astype(jnp.bfloat16)     # lo + 8
        hi16 = (u8 & jnp.int8(-16)).astype(jnp.bfloat16)   # 16 * hi
        w2 = jnp.concatenate([lo8, hi16], axis=0)          # [2g, bn]
        xl = x[:, c * g:(c + 1) * g]
        xh = x[:, half + c * g:half + (c + 1) * g] \
            * jnp.bfloat16(0.0625)                         # exact: 2^-4
        x2 = jnp.concatenate([xl, xh], axis=1)             # [rows, 2g]
        pd = jnp.dot(x2, w2, preferred_element_type=jnp.float32)
        corr = jnp.sum(xl.astype(jnp.float32), axis=1,
                       keepdims=True) * jnp.float32(8.0)
        acc = acc + (pd - corr) \
            * sc_ref[c, :].astype(jnp.float32)[None, :]
    o_ref[:, :] = acc.astype(o_ref.dtype)


def _kernel_group_slab(x_ref, qw_ref, sc_ref, o_ref, *, bits, group_size):
    _group_dots_slab(x_ref[:, :], qw_ref, sc_ref, o_ref,
                     group_size=group_size)


def _kernel_group_norm_slab(x_ref, nw_ref, qw_ref, sc_ref, o_ref, *,
                            bits, group_size, eps):
    x32 = x_ref[:, :].astype(jnp.float32)
    ms = jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
    xn = (x32 * jax.lax.rsqrt(ms + eps)).astype(jnp.bfloat16) \
        * nw_ref[:, :].astype(jnp.bfloat16)
    _group_dots_slab(xn, qw_ref, sc_ref, o_ref, group_size=group_size)


def _quantize_rows_i8(x):
    """Per-token (row) symmetric int8 activation quantization. x [rows,
    din] bf16 -> (xq int8, sx f32 [rows, 1]). Runs on the VPU inside the
    kernel: the full row is present in every block, so the row max needs
    no cross-block reduction."""
    x32 = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(x32), axis=-1, keepdims=True)
    sx = jnp.maximum(amax, 1e-30) * jnp.float32(1.0 / 127.0)
    xq = jnp.clip(jnp.round(x32 / sx), -127, 127).astype(jnp.int8)
    return xq, sx


def _group_dots_w4a8(x, qw_ref, sc_ref, o_ref, *, group_size, bits=4):
    """W4A8 group dots (int4 split-half packing only): activations are
    quantized per token-row to int8 IN the kernel, each nibble operand
    is decoded by a single int8 AND (it STAYS int8 — no bf16 cast pass,
    no 2x-width VMEM copy of the weight tile), and the MXU runs native
    int8 x int8 -> int32 dots. Per-group exact-i32 partials are rescaled
    once in f32; the per-row activation scale is applied once at the
    end (linearity).

    Exactness: every i32 partial is exact (|pd_lo| <= g*127*15,
    |pd_hi| <= g*127*128 << 2^31); the only loss vs the bf16 kernel is
    the int8 activation quantization itself — which the accuracy gate
    (tools/ppl_gate.py) certifies. Round-5 probe basis: i8dot/i8nounpack
    rows of docs/QMM_EXPLORE.json."""
    bn = qw_ref.shape[1]
    rows = x.shape[0]
    g = group_size
    half = qw_ref.shape[0]
    ng_half = half // g
    xq, sx = _quantize_rows_i8(x)
    dn = (((1,), (0,)), ((), ()))
    acc = jnp.zeros((rows, bn), jnp.float32)
    if bits == 8:
        # W8A8: weights are already int8 values — straight int8 MXU
        # dots, one per scale group, partials rescaled in f32.
        din = qw_ref.shape[0]
        for c in range(din // g):
            pd = jax.lax.dot_general(
                xq[:, c * g:(c + 1) * g],
                qw_ref[c * g:(c + 1) * g, :], dn,
                preferred_element_type=jnp.int32)
            acc = acc + pd.astype(jnp.float32) \
                * sc_ref[c, :].astype(jnp.float32)[None, :]
        o_ref[:, :] = (acc * sx).astype(o_ref.dtype)
        return
    for c in range(ng_half):
        u8 = qw_ref[c * g:(c + 1) * g, :]
        lo8 = u8 & jnp.int8(15)             # lo + 8 (offset-binary)
        hi8 = u8 & jnp.int8(-16)            # 16 * hi
        xl8 = xq[:, c * g:(c + 1) * g]
        xh8 = xq[:, half + c * g:half + (c + 1) * g]
        pd_lo = jax.lax.dot_general(xl8, lo8, dn,
                                    preferred_element_type=jnp.int32)
        pd_hi = jax.lax.dot_general(xh8, hi8, dn,
                                    preferred_element_type=jnp.int32)
        corr = jnp.sum(xl8.astype(jnp.int32), axis=1, keepdims=True) * 8
        s_lo = sc_ref[c, :].astype(jnp.float32)
        s_hi = sc_ref[ng_half + c, :].astype(jnp.float32) \
            * jnp.float32(0.0625)
        acc = acc + (pd_lo - corr).astype(jnp.float32) * s_lo[None, :] \
            + pd_hi.astype(jnp.float32) * s_hi[None, :]
    o_ref[:, :] = (acc * sx).astype(o_ref.dtype)


def _kernel_group_w4a8(x_ref, qw_ref, sc_ref, o_ref, *, bits, group_size):
    _group_dots_w4a8(x_ref[:, :], qw_ref, sc_ref, o_ref,
                     group_size=group_size, bits=bits)


def _kernel_group_norm_w4a8(x_ref, nw_ref, qw_ref, sc_ref, o_ref, *,
                            bits, group_size, eps):
    """RMSNorm fused ahead of the W4A8 quantize+dots (decode's
    pre-attention / pre-MLP pattern)."""
    x32 = x_ref[:, :].astype(jnp.float32)
    ms = jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
    xn = (x32 * jax.lax.rsqrt(ms + eps)).astype(jnp.bfloat16) \
        * nw_ref[:, :].astype(jnp.bfloat16)
    _group_dots_w4a8(xn, qw_ref, sc_ref, o_ref, group_size=group_size,
                     bits=bits)


def _kernel_group_ln(x_ref, g_ref, b_ref, qw_ref, sc_ref, bias_ref,
                     o_ref, *, bits, group_size, eps):
    """LayerNorm (mean-subtracted, gamma/beta) + group-dot matmul +
    output bias, one kernel. The GPT-2 decode block's pre-matmul
    pattern: at B=16 the 345M decode step is per-op-LATENCY-bound
    (docs/SERVING_BUDGET.json round-5: 6.8 ms/step vs 0.9 ms of HBM),
    so removing the standalone LN (and the fusion break a pallas_call
    causes on both sides) buys more than any stream optimization."""
    x32 = x_ref[:, :].astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mu), axis=-1, keepdims=True)
    xn = ((x32 - mu) * jax.lax.rsqrt(var + eps)
          * g_ref[:, :].astype(jnp.float32)
          + b_ref[:, :].astype(jnp.float32)).astype(jnp.bfloat16)
    _group_dots(xn, qw_ref, sc_ref, o_ref, bits=bits,
                group_size=group_size)
    o_ref[:, :] = (o_ref[:, :].astype(jnp.float32)
                   + bias_ref[:, :].astype(jnp.float32)
                   ).astype(o_ref.dtype)


def quant_matmul_ln(x, gamma, beta, q: QuantizedLinear, bias=None,
                    eps: float = 1e-5, block_out: int = 0,
                    interpret: bool = False):
    """LayerNorm(x; gamma, beta) @ q + bias, fused (GPT-2 decode
    pattern). Falls back to the exact composition off-TPU or for
    shapes the kernel rejects."""
    def fallback():
        x32 = x.astype(jnp.float32)
        mu = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mu), axis=-1, keepdims=True)
        xn = ((x32 - mu) * jax.lax.rsqrt(var + eps)
              * gamma.astype(jnp.float32)
              + beta.astype(jnp.float32)).astype(x.dtype)
        out = quant_matmul(xn, q, block_out=block_out,
                           interpret=interpret)
        return out if bias is None else out + bias

    if not use_pallas(interpret):
        return fallback()
    interpret = interpret or (pallas_interpret() and not is_tpu())
    import jax.experimental.pallas as pl

    *lead, din = x.shape
    dout = q.out_physical
    rows = 1
    for d in lead:
        rows *= d
    x2 = x.reshape(rows, din)
    pad_rows = max(8, rows)
    if pad_rows != rows:
        x2 = jnp.pad(x2, ((0, pad_rows - rows), (0, 0)))
    pack = 1 if q.bits == 8 else 2
    tuned = _tuned(din, q.out_features, q.bits)
    if tuned and not block_out:
        block_out = int(tuned.get("bn", 0))
    if block_out and dout % block_out:
        block_out = 0
    bn = block_out or _pick_bn(dout, din, q.bits)
    ng = q.scales.shape[0]
    group_ok = (din // pack) % q.group_size == 0 and \
        q.group_size % 128 == 0
    if (not group_ok or bn == 0 or pad_rows > 256
            or (q.bits == 4 and (q.paired or ng % 2))
            or x.dtype != jnp.bfloat16):
        return fallback()

    b2 = (jnp.zeros((1, dout), jnp.float32) if bias is None
          else jnp.pad(bias.astype(jnp.float32).reshape(1, -1),
                       ((0, 0), (0, dout - bias.shape[-1]))))
    out = pl.pallas_call(
        functools.partial(_kernel_group_ln, bits=q.bits,
                          group_size=q.group_size, eps=eps),
        grid=(dout // bn,),
        in_specs=[
            pl.BlockSpec((pad_rows, din), lambda j: (0, 0)),
            pl.BlockSpec((1, din), lambda j: (0, 0)),
            pl.BlockSpec((1, din), lambda j: (0, 0)),
            pl.BlockSpec((din // pack, bn), lambda j: (0, j)),
            pl.BlockSpec((ng, bn), lambda j: (0, j)),
            pl.BlockSpec((1, bn), lambda j: (0, j)),
        ],
        out_specs=pl.BlockSpec((pad_rows, bn), lambda j: (0, j)),
        out_shape=jax.ShapeDtypeStruct((pad_rows, dout), x.dtype),
        interpret=interpret,
    )(x2, gamma.reshape(1, din), beta.reshape(1, din), q.qweight,
      q.scales, b2)
    out = out[:rows, :q.out_features]
    return out.reshape(*lead, q.out_features)


def quant_matmul_w4a8_ref(x, q: QuantizedLinear):
    """jnp oracle for the W4A8 kernels: same per-row int8 activation
    quantization, weights dequantized in f32 (the kernel's grouped i32
    partials are exact, so this matches to f32-rounding)."""
    *lead, din = x.shape
    x2 = x.reshape(-1, din)
    xq, sx = _quantize_rows_i8(x2)
    w = dequantize_weight(q, dtype=jnp.float32)   # [din, out_features]
    out = (jnp.matmul(xq.astype(jnp.float32), w,
                      preferred_element_type=jnp.float32) * sx)
    return out.astype(x.dtype).reshape(*lead, q.out_features)


def _kernel_group2d(x_lo_ref, x_hi_ref, qw_ref, sc_ref,
                    o_ref, acc_ref, *, bits, group_size):
    """2D-grid group-dot kernel: grid (dout/bn, kr/kb), k innermost. The
    1D kernel's grid length = dout/bn; short grids (wo: 4-16 steps)
    cannot hide DMA latency and measured 460-600 GB/s vs 680-810 at long
    grids (docs/QMM_TUNE_REPORT.json). Splitting the contraction dim
    multiplies grid length by kr/kb at constant tile size; partials
    accumulate in an fp32 scratch that persists across the k steps of
    one output tile (out written at the last k step).

    Blocks: x_lo/x_hi [rows, kb] (the pipeliner slices x — in-kernel
    dynamic LANE starts are unprovable for Mosaic), qw [kb, bn] packed,
    sc [ng, bn] (ALL scale rows for the output tile — kb/g rows per
    chunk can be < 8, too thin for a block; dynamic SUBLANE reads are
    fine). int8 ignores the x_hi operand (aliased block).
    """
    import jax.experimental.pallas as pl

    k_idx = pl.program_id(1)

    @pl.when(k_idx == 0)
    def _():
        acc_ref[:, :] = jnp.zeros_like(acc_ref)

    g = group_size
    bn = qw_ref.shape[1]
    kb = qw_ref.shape[0]
    ng = sc_ref.shape[0]
    ng_c = kb // g
    # dynamic sublane reads need 8-alignment proofs Mosaic can't make for
    # bf16 scales; select the row by masked reduction over the (small)
    # full block instead
    sc_all = sc_ref[:, :].astype(jnp.float32)          # [ng, bn]
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (ng, 1), 0)

    def sc_row(idx):
        return jnp.sum(jnp.where(row_ids == idx, sc_all, 0.0), axis=0,
                       keepdims=True)                  # [1, bn]

    acc = acc_ref[:, :]
    if bits == 8:
        for c in range(kb // g):
            w = qw_ref[c * g:(c + 1) * g, :].astype(jnp.bfloat16)
            pd = jnp.dot(x_lo_ref[:, c * g:(c + 1) * g], w,
                         preferred_element_type=jnp.float32)
            acc = acc + pd * sc_row(k_idx * ng_c + c)
    else:
        for c in range(kb // g):
            u = qw_ref[c * g:(c + 1) * g, :].astype(jnp.int32)
            lo = ((u & 15) - 8).astype(jnp.bfloat16)  # offset-binary lo
            hi = ((u << 24) >> 28).astype(jnp.bfloat16)
            pd_lo = jnp.dot(x_lo_ref[:, c * g:(c + 1) * g], lo,
                            preferred_element_type=jnp.float32)
            pd_hi = jnp.dot(x_hi_ref[:, c * g:(c + 1) * g], hi,
                            preferred_element_type=jnp.float32)
            acc = acc + pd_lo * sc_row(k_idx * ng_c + c) \
                + pd_hi * sc_row(ng // 2 + k_idx * ng_c + c)
    acc_ref[:, :] = acc

    @pl.when(k_idx == pl.num_programs(1) - 1)
    def _():
        o_ref[:, :] = acc_ref[:, :].astype(o_ref.dtype)


def quant_matmul_2d(x, q: QuantizedLinear, bn: int, kb: int,
                    interpret: bool = False):
    """2D-grid variant (see _kernel_group2d). kb = PACKED contraction
    rows per step (multiple of group_size, divides the stored rows);
    bn divides the physical dout."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    *lead, din = x.shape
    dout = q.out_physical
    kr = q.qweight.shape[0]
    rows = 1
    for d in lead:
        rows *= d
    x2 = x.reshape(rows, din)
    pad_rows = max(8, rows)
    if pad_rows != rows:
        x2 = jnp.pad(x2, ((0, pad_rows - rows), (0, 0)))
    g = q.group_size
    ng = q.scales.shape[0]
    assert kb % g == 0 and kr % kb == 0 and dout % bn == 0
    xh_off = kr // kb if q.bits == 4 else 0

    grid = (dout // bn, kr // kb)
    out = pl.pallas_call(
        functools.partial(_kernel_group2d, bits=q.bits, group_size=g),
        grid=grid,
        in_specs=[
            pl.BlockSpec((pad_rows, kb), lambda j, k: (0, k)),
            pl.BlockSpec((pad_rows, kb),
                         lambda j, k, o=xh_off: (0, k + o)),
            pl.BlockSpec((kb, bn), lambda j, k: (k, j)),
            pl.BlockSpec((ng, bn), lambda j, k: (0, j)),
        ],
        out_specs=pl.BlockSpec((pad_rows, bn), lambda j, k: (0, j)),
        out_shape=jax.ShapeDtypeStruct((pad_rows, dout), x.dtype),
        scratch_shapes=[pltpu.VMEM((pad_rows, bn), jnp.float32)],
        interpret=interpret,
    )(x2, x2, q.qweight, q.scales)
    out = out[:rows, :q.out_features]
    return out.reshape(*lead, q.out_features)


_TUNE_DEFAULT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "..", "..", "docs", "qmm_tune.json")


@functools.lru_cache(maxsize=8)
def _load_tune(path: str) -> dict:
    try:
        with open(path) as f:
            return json.load(f)
    except Exception:
        return {}


def _tuned(din: int, dout: int, bits: int):
    """On-chip-tuned (block_out, variant) for a weight shape — the
    PerfEngine-style persisted tuning the reference keeps per workload
    (reference include/core/perf_engine.h:8-51); docs/qmm_tune.json is
    written by tools/qmm_tune.py. Resolved at trace time."""
    path = os.environ.get("INFINITPU_QMM_TUNE", _TUNE_DEFAULT)
    return _load_tune(path).get(f"{din}:{dout}:{bits}")


def _pick_chunk(rows: int, group: int, bits: int) -> int:
    """Chunk: multiple of the scale group dividing `rows` (STORED rows of
    the qweight tile: din for int8, din//2 packed for int4), sized so the
    dequant intermediates stay in VMEM comfortably."""
    target = 2048 if bits == 8 else 1024
    best = 0
    b = group
    while b <= rows:
        if rows % b == 0 and b <= target:
            best = b
        b += group
    return best or (rows if rows % group == 0 else 0)


def _pick_bn(dout: int, din: int, bits: int) -> int:
    """Output tile: multiple of 128 dividing dout; packed weight tile
    din*bn/pack bytes capped at ~2MB (double-buffered by the pipeliner)."""
    pack = 1 if bits == 8 else 2
    cap_elems = (2 << 20) * pack
    cap = max(128, cap_elems // max(din, 1))
    best = 0
    b = 128
    while b <= min(cap, dout):
        if dout % b == 0:
            best = b
        b += 128
    return best


def quant_matmul_norm(x, norm_w, q: QuantizedLinear, eps: float = 1e-5,
                      block_out: int = 0, interpret: bool = False):
    """RMSNorm(x) * norm_w @ q, the norm fused into the matmul kernel
    (decode's pre-attention/pre-MLP pattern). Falls back to
    rmsnorm + quant_matmul off-TPU or for shapes the kernel rejects."""
    def fallback():
        x32 = x.astype(jnp.float32)
        ms = jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
        xn = (x32 * jax.lax.rsqrt(ms + eps)).astype(x.dtype) * norm_w
        return quant_matmul(xn, q, block_out=block_out,
                            interpret=interpret)

    if not use_pallas(interpret):
        return fallback()
    interpret = interpret or (pallas_interpret() and not is_tpu())
    import jax.experimental.pallas as pl

    *lead, din = x.shape
    dout = q.out_physical
    rows = 1
    for d in lead:
        rows *= d
    x2 = x.reshape(rows, din)
    pad_rows = max(8, rows)
    if pad_rows != rows:
        x2 = jnp.pad(x2, ((0, pad_rows - rows), (0, 0)))

    pack = 1 if q.bits == 8 else 2
    tuned = _tuned(din, q.out_features, q.bits)
    if tuned and not block_out:
        block_out = int(tuned.get("bn", 0))
    if block_out and dout % block_out:
        block_out = 0               # tuned bn from a different padding
    bn = block_out or _pick_bn(dout, din, q.bits)
    ng = q.scales.shape[0]
    group_ok = (din // pack) % q.group_size == 0 and \
        q.group_size % 128 == 0
    if (not group_ok or bn == 0 or pad_rows > 256
            or (q.bits == 4 and not q.paired and ng % 2)
            # the fused kernel normalizes into bf16; for wider activation
            # dtypes that would silently diverge from the unfused path
            or x.dtype != jnp.bfloat16):
        return fallback()

    variant = (tuned or {}).get("variant") \
        or os.environ.get("INFINITPU_QMM_VARIANT", "group")
    if q.bits == 4 and q.paired:
        variant = "slab"
    if variant == "slab":
        if not (q.bits == 4 and q.paired):
            return fallback()
        norm_kernel = functools.partial(
            _kernel_group_norm_slab, bits=q.bits,
            group_size=q.group_size, eps=eps)
    elif variant == "w4a8":
        norm_kernel = functools.partial(
            _kernel_group_norm_w4a8, bits=q.bits,
            group_size=q.group_size, eps=eps)
    else:
        norm_kernel = functools.partial(
            _kernel_group_norm, bits=q.bits, group_size=q.group_size,
            eps=eps)
    nw2 = norm_w.reshape(1, din)
    out = pl.pallas_call(
        norm_kernel,
        grid=(dout // bn,),
        in_specs=[
            pl.BlockSpec((pad_rows, din), lambda j: (0, 0)),
            pl.BlockSpec((1, din), lambda j: (0, 0)),
            pl.BlockSpec((din // pack, bn), lambda j: (0, j)),
            pl.BlockSpec((ng, bn), lambda j: (0, j)),
        ],
        out_specs=pl.BlockSpec((pad_rows, bn), lambda j: (0, j)),
        out_shape=jax.ShapeDtypeStruct((pad_rows, dout), x.dtype),
        interpret=interpret,
    )(x2, nw2, q.qweight, q.scales)
    out = out[:rows, :q.out_features]
    return out.reshape(*lead, q.out_features)


def quant_matmul(x, q: QuantizedLinear, block_out: int = 0,
                 interpret: bool = False, variant: Optional[str] = None):
    """x [..., din] @ q -> [..., dout].

    variant: "group" (default; scales applied to group-partial dots —
    measured faster on-chip, the weight path is pure cast), "chunk"
    (scales multiplied into dequantized weight chunks), or "w4a8"
    (per-token int8 activations + int8 MXU dots); env override
    INFINITPU_QMM_VARIANT."""
    tuned = _tuned(x.shape[-1], q.out_features, q.bits)
    if tuned:
        block_out = block_out or int(tuned.get("bn", 0))
        variant = variant or tuned.get("variant")
    variant = variant or os.environ.get("INFINITPU_QMM_VARIANT", "group")
    if not use_pallas(interpret):
        # the w4a8 fallback keeps the activation-quant error IN the
        # math off-TPU, so accuracy gates certify the same semantics
        # the chip runs
        if variant == "w4a8":
            return quant_matmul_w4a8_ref(x, q)
        return quant_matmul_ref(x, q)
    interpret = interpret or (pallas_interpret() and not is_tpu())
    if block_out and q.out_physical % block_out:
        block_out = 0               # tuned bn from a different padding
    if variant == "group2d" and q.bits == 4 and q.paired:
        variant = "slab"        # 2d kernel reads the split-half scales
    if variant == "group2d" and tuned and tuned.get("kb"):
        kb = int(tuned["kb"])
        kr = q.qweight.shape[0]
        rows2d = 1
        for d in x.shape[:-1]:
            rows2d *= d
        if (block_out and kb % q.group_size == 0 and kr % kb == 0
                and q.group_size % 128 == 0 and max(8, rows2d) <= 256):
            return quant_matmul_2d(x, q, block_out, kb,
                                   interpret=interpret)
        variant = "group"
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    *lead, din = x.shape
    dout = q.out_physical
    rows = 1
    for d in lead:
        rows *= d
    x2 = x.reshape(rows, din)
    pad_rows = max(8, rows)  # MXU-friendly sublane count
    if pad_rows != rows:
        x2 = jnp.pad(x2, ((0, pad_rows - rows), (0, 0)))

    pack = 1 if q.bits == 8 else 2
    chunk = _pick_chunk(din // pack, q.group_size, q.bits)
    bn = block_out or _pick_bn(dout, din, q.bits)
    ng = q.scales.shape[0]
    group_ok = (din // pack) % q.group_size == 0 and q.group_size % 128 == 0
    paired = q.bits == 4 and q.paired
    if paired:
        variant = "slab"        # paired scales exist FOR the slab kernel
    elif variant == "slab":
        variant = "group"       # slab math needs the paired partition
    if variant in ("group", "w4a8", "slab") and not group_ok:
        variant = "chunk"
    if variant == "w4a8" and x.dtype not in (jnp.bfloat16, jnp.float32):
        variant = "group"   # in-kernel activation quant: bf16/f32 input
    if paired and variant != "slab":
        return quant_matmul_ref(x, q)   # no other kernel reads paired sc
    if (chunk == 0 or bn == 0 or chunk % 128 or pad_rows > 256
            or (q.bits == 4 and not paired and ng % 2)):
        return quant_matmul_ref(x, q)

    if variant == "slab":
        kernel = functools.partial(_kernel_group_slab, bits=q.bits,
                                   group_size=q.group_size)
    elif variant == "w4a8":
        kernel = functools.partial(_kernel_group_w4a8, bits=q.bits,
                                   group_size=q.group_size)
    elif variant == "group":
        kernel = functools.partial(_kernel_group, bits=q.bits,
                                   group_size=q.group_size)
    else:
        kernel = functools.partial(_kernel, bits=q.bits,
                                   group_size=q.group_size, chunk=chunk)
    out = pl.pallas_call(
        kernel,
        grid=(dout // bn,),
        in_specs=[
            pl.BlockSpec((pad_rows, din), lambda j: (0, 0)),
            pl.BlockSpec((din // pack, bn), lambda j: (0, j)),
            pl.BlockSpec((ng, bn), lambda j: (0, j)),
        ],
        out_specs=pl.BlockSpec((pad_rows, bn), lambda j: (0, j)),
        out_shape=jax.ShapeDtypeStruct((pad_rows, dout), x.dtype),
        interpret=interpret,
    )(x2, q.qweight, q.scales)
    out = out[:rows, :q.out_features]
    return out.reshape(*lead, q.out_features)
