"""Normalization kernels (RMSNorm / LayerNorm) in Pallas.

Replaces the reference's hand-written rmsnorm/layernorm CUDA kernels
(src/kernels/cuda/rms_norm.cu, layer_norm.cu). One grid step per row-block:
rows stream through VMEM, reduction in fp32 on the VPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from infinitensor_tpu.utils.platform import (
    is_tpu, pallas_interpret, use_pallas,
)


def rmsnorm_ref(x, w, eps: float = 1e-6):
    x32 = x.astype(jnp.float32)
    ms = jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
    return (x32 * lax.rsqrt(ms + eps) * w.astype(jnp.float32)).astype(x.dtype)


def _rmsnorm_kernel(x_ref, w_ref, o_ref, *, eps):
    x = x_ref[:, :].astype(jnp.float32)
    ms = jnp.mean(jnp.square(x), axis=-1, keepdims=True)
    o_ref[:, :] = (x * lax.rsqrt(ms + eps) * w_ref[:, :].astype(jnp.float32)
                   ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "block_rows",
                                              "interpret"))
def rmsnorm(x, w, eps: float = 1e-6, block_rows: int = 256,
            interpret: bool = False):
    if not use_pallas(interpret):
        return rmsnorm_ref(x, w, eps)
    interpret = interpret or (pallas_interpret() and not is_tpu())
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    orig_shape = x.shape
    d = x.shape[-1]
    rows = x.size // d
    x2 = x.reshape(rows, d)
    block_rows = min(block_rows, rows)
    # Row count must tile and be sublane-aligned; tiny row counts (decode
    # steps) gain nothing from Pallas — let XLA fuse those.
    if rows % block_rows or rows < 8:
        return rmsnorm_ref(x, w, eps).reshape(orig_shape)
    out = pl.pallas_call(
        functools.partial(_rmsnorm_kernel, eps=eps),
        grid=(rows // block_rows,),
        in_specs=[
            pl.BlockSpec((block_rows, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_rows, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, d), x.dtype),
        interpret=interpret,
    )(x2, w.reshape(1, d))
    return out.reshape(orig_shape)
