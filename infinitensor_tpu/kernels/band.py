"""Pallas band-matmul kernels: G2BMM / GBMM (Longformer local attention).

Reference: src/kernels/cuda/gbmm_g2bmm.cu (+ custom_ops.cu) — the CUDA
kernels walk the band directly. The jnp lowerings (ops/lowering.py)
either materialize the gathered band tensor [b, m, 2w+1, k] (a (2w+1)x
HBM/VMEM blowup) or roll-scan 2w+1 times over the full B (reads B
(2w+1)x from HBM). Here each grid step loads a [3R, k] sliding WINDOW of
B (three consecutive row blocks, boundary blocks clamped+masked) into
VMEM once and walks the 2w+1 diagonals with dynamic-sliced VPU
mult-reduces — B is read ~3x total regardless of w, and nothing larger
than the window ever exists.

g2bmm: out[b, i, j] = sum_k A[b,i,k] * B[b, i+(j-w)d, k]   (scores)
gbmm:  out[b, i, k] = sum_j W[b,i,j] * B[b, i+(j-w)d, k]   (weights @ V)

Dilation d > 1 stays on the jnp path (the window becomes d*w wide).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

from infinitensor_tpu.utils.platform import is_tpu, pallas_interpret


def _pick_rows(m: int, w: int) -> int:
    """Row block: multiple of 8 dividing m, >= w (so prev/cur/next blocks
    cover the window), VMEM-modest. 0 = no valid choice -> jnp path."""
    lo = max(8, ((w + 7) // 8) * 8)
    best = 0
    r = lo
    while r <= min(m, 1024):
        if m % r == 0:
            best = r
            break
        r += 8
    return best


def _g2bmm_kernel(a_ref, bp_ref, bc_ref, bn_ref, o_ref, win_ref, *,
                  w, R, m):
    import jax.experimental.pallas as pl

    r = pl.program_id(1)
    base = r * R
    win_ref[:R, :] = bp_ref[:, :]
    win_ref[R:2 * R, :] = bc_ref[:, :]
    win_ref[2 * R:, :] = bn_ref[:, :]
    a = a_ref[:, :].astype(jnp.float32)
    rows = base + jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0)

    # STATIC unroll over the 2w+1 diagonals: Mosaic cannot prove a
    # dynamic lane index is 128-aligned, so dynamic 1-wide column stores
    # are rejected; static slices lower fine (w is gated <= 128)
    for j in range(2 * w + 1):
        off = j - w
        seg = win_ref[R + off:2 * R + off, :]
        col = jnp.sum(a * seg.astype(jnp.float32), axis=1, keepdims=True)
        tgt = rows + off
        col = jnp.where((tgt >= 0) & (tgt < m), col, 0.0)
        o_ref[:, j:j + 1] = col.astype(o_ref.dtype)


def _gbmm_kernel(w_ref, bp_ref, bc_ref, bn_ref, o_ref, win_ref, *,
                 w, R, m):
    import jax.experimental.pallas as pl

    r = pl.program_id(1)
    base = r * R
    win_ref[:R, :] = bp_ref[:, :]
    win_ref[R:2 * R, :] = bc_ref[:, :]
    win_ref[2 * R:, :] = bn_ref[:, :]
    wts = w_ref[:, :].astype(jnp.float32)            # [R, 2w+1]
    rows = base + jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0)
    acc0 = jnp.zeros(o_ref.shape, jnp.float32)

    acc = acc0
    for j in range(2 * w + 1):       # static unroll (see _g2bmm_kernel)
        off = j - w
        seg = win_ref[R + off:2 * R + off, :]
        wt = w_ref[:, j:j + 1].astype(jnp.float32)
        tgt = rows + off
        wt = jnp.where((tgt >= 0) & (tgt < m), wt, 0.0)
        acc = acc + wt * seg.astype(jnp.float32)
    o_ref[:, :] = acc.astype(o_ref.dtype)


def _window_specs(R, K, nr):
    import jax.experimental.pallas as pl

    def prev_i(bz, r):
        return (bz, jnp.maximum(r - 1, 0), 0)

    def cur_i(bz, r):
        return (bz, r, 0)

    def next_i(bz, r):
        return (bz, jnp.minimum(r + 1, nr - 1), 0)

    return [pl.BlockSpec((None, R, K), prev_i),
            pl.BlockSpec((None, R, K), cur_i),
            pl.BlockSpec((None, R, K), next_i)]


@functools.partial(jax.jit, static_argnames=("w", "d", "interpret"))
def g2bmm_band(a, b, w: int, d: int = 1, interpret: bool = False):
    """A [bz, m, k] x B [bz, m, k] -> band scores [bz, m, 2w+1]."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bz, m, k = a.shape
    R = _pick_rows(m, w)
    assert d == 1 and R, "caller gates on d==1 and a valid row block"
    nr = m // R
    kern = functools.partial(_g2bmm_kernel, w=w, R=R, m=m)
    return pl.pallas_call(
        kern,
        grid=(bz, nr),
        in_specs=[pl.BlockSpec((None, R, k), lambda bz_, r: (bz_, r, 0))]
        + _window_specs(R, k, nr),
        out_specs=pl.BlockSpec((None, R, 2 * w + 1),
                               lambda bz_, r: (bz_, r, 0)),
        out_shape=jax.ShapeDtypeStruct((bz, m, 2 * w + 1), a.dtype),
        scratch_shapes=[pltpu.VMEM((3 * R, k), b.dtype)],
        interpret=interpret,
    )(a, b, b, b)


@functools.partial(jax.jit, static_argnames=("w", "d", "interpret"))
def gbmm_band(wts, b, w: int, d: int = 1, interpret: bool = False):
    """Band weights [bz, m, 2w+1] x B [bz, m, k] -> [bz, m, k]."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bz, m, k = b.shape
    R = _pick_rows(m, w)
    assert d == 1 and R, "caller gates on d==1 and a valid row block"
    nr = m // R
    kern = functools.partial(_gbmm_kernel, w=w, R=R, m=m)
    return pl.pallas_call(
        kern,
        grid=(bz, nr),
        in_specs=[pl.BlockSpec((None, R, 2 * w + 1),
                               lambda bz_, r: (bz_, r, 0))]
        + _window_specs(R, k, nr),
        out_specs=pl.BlockSpec((None, R, k), lambda bz_, r: (bz_, r, 0)),
        out_shape=jax.ShapeDtypeStruct((bz, m, k), b.dtype),
        scratch_shapes=[pltpu.VMEM((3 * R, k), b.dtype)],
        interpret=interpret,
    )(wts, b, b, b)


def band_kernels_usable(m: int, k: int, w: int, d: int,
                        interpret: bool = False) -> bool:
    """Gate shared by the lowerings: dilation 1, a valid row block, lane-
    aligned k, and a TPU (or the interpreter)."""
    if d != 1 or k % 128 or w > 128 or not _pick_rows(m, w):
        return False
    return interpret or is_tpu() or pallas_interpret()
