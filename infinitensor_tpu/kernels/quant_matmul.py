"""Fused weight-only dequant + matmul Pallas kernel.

The decode-time hot op of quantized serving (BASELINE north star: >=85% of
dequant+matmul roofline). Decode matmuls are memory-bound on the *weights*:
activations are [B<=32, din] but weights are [din, dout] — so the kernel's
job is to stream int8/int4 weight tiles HBM->VMEM exactly once, dequantize
in-registers, and feed the MXU, with the grid over output tiles so XLA's
Pallas pipeliner double-buffers the weight stream.

jnp reference: quant_matmul_ref (used as oracle on CPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from infinitensor_tpu.utils.platform import is_tpu

from infinitensor_tpu.quant.weight_only import (
    QuantizedLinear, dequantize_weight, _unpack_int4,
)


def quant_matmul_ref(x, q: QuantizedLinear):
    w = dequantize_weight(q, dtype=x.dtype)
    return jnp.matmul(x, w, preferred_element_type=jnp.float32).astype(x.dtype)


def _kernel_int8(x_ref, qw_ref, sc_ref, o_ref, *, group_size):
    import jax.experimental.pallas as pl  # noqa: F401

    qw = qw_ref[:, :]                                   # [din, bn] int8
    din, bn = qw.shape
    ng = din // group_size
    wf = qw.astype(jnp.float32).reshape(ng, group_size, bn)
    wf = wf * sc_ref[:, :].reshape(ng, 1, bn)
    w = wf.reshape(din, bn).astype(jnp.bfloat16)
    x = x_ref[:, :]
    o_ref[:, :] = jnp.dot(x, w, preferred_element_type=jnp.float32
                          ).astype(o_ref.dtype)


def _kernel_int4(x_ref, qw_ref, sc_ref, o_ref, *, group_size):
    qw = _unpack_int4(qw_ref[:, :])                     # [din, bn] int8
    din, bn = qw.shape
    ng = din // group_size
    wf = qw.astype(jnp.float32).reshape(ng, group_size, bn)
    wf = wf * sc_ref[:, :].reshape(ng, 1, bn)
    w = wf.reshape(din, bn).astype(jnp.bfloat16)
    o_ref[:, :] = jnp.dot(x_ref[:, :], w, preferred_element_type=jnp.float32
                          ).astype(o_ref.dtype)


def _pick_block(dout: int, din: int, vmem_budget: int = 4 * 1024 * 1024
                ) -> int:
    """Largest lane-aligned (multiple of 128) divisor of dout whose weight
    block fits the VMEM budget (the Pallas pipeliner double-buffers the
    int8 block, so din*block must stay well under VMEM)."""
    cap = max(128, vmem_budget // max(din, 1))
    best = 0
    b = 128
    while b <= min(cap, dout):
        if dout % b == 0:
            best = b
        b += 128
    return best


@functools.partial(jax.jit, static_argnames=("block_out",))
def quant_matmul(x, q: QuantizedLinear, block_out: int = 0):
    """x [..., din] @ q -> [..., dout]."""
    if not is_tpu():
        return quant_matmul_ref(x, q)
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    *lead, din = x.shape
    dout = q.out_features
    rows = 1
    for d in lead:
        rows *= d
    x2 = x.reshape(rows, din)
    # tiny row counts still need an MXU-friendly sublane count; pad to 8
    pad_rows = max(8, rows)
    if pad_rows != rows:
        x2 = jnp.pad(x2, ((0, pad_rows - rows), (0, 0)))
    bn = block_out or _pick_block(dout, din)
    if bn == 0 or dout % bn:
        return quant_matmul_ref(x, q)
    ng = q.scales.shape[0]
    qrows = q.qweight.shape[0]
    kernel = _kernel_int4 if q.bits == 4 else _kernel_int8
    out = pl.pallas_call(
        functools.partial(kernel, group_size=q.group_size),
        grid=(dout // bn,),
        in_specs=[
            pl.BlockSpec((pad_rows, din), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((qrows, bn), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ng, bn), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((pad_rows, bn), lambda j: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((pad_rows, dout), x.dtype),
    )(x2, q.qweight, q.scales)
    return out[:rows].reshape(*lead, dout)
