"""Lowering: graph operators -> JAX computations.

This registry is the TPU-native replacement for the reference's per-device
kernel zoos (reference src/kernels/{cuda,bang,kunlun,ascend,intelcpu}/ — six
hand-written backends collapse into one). Every op lowers to pure JAX so XLA
fuses elementwise chains into matmuls/convs; the hot LLM ops (AttentionKVCache,
RMSNorm, RoPE, quantized matmul) additionally have Pallas TPU kernels in
infinitensor_tpu/kernels/, selected by ``LowerCtx.use_pallas``.

Comm ops lower to XLA collectives (lax.psum / all_gather / ppermute) and are
only valid inside a shard_map'ed region — the analog of the reference's NCCL
kernels being valid only after initComm (src/kernels/cuda/all_reduce.cc:8-66).
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax import lax

from infinitensor_tpu.core import dtype as dt
from infinitensor_tpu.core.dtype import DataType
from infinitensor_tpu.core.operator import Operator

LOWERINGS: dict[str, Callable] = {}


@dataclasses.dataclass
class LowerCtx:
    """Per-compile lowering configuration."""

    use_pallas: bool = False          # route hot ops to Pallas kernels
    axis_name: str = "tp"             # mesh axis for comm ops (shard_map)
    world_size: int = 1
    matmul_compute_dtype: Optional[str] = None  # e.g. "bfloat16" / "tf32"-like


DEFAULT_CTX = LowerCtx()


def register(*op_types):
    def deco(fn):
        for t in op_types:
            LOWERINGS[t] = fn
        return fn
    return deco


def lower_op(op: Operator, ins: list, ctx: LowerCtx = DEFAULT_CTX) -> list:
    try:
        fn = LOWERINGS[op.op_type]
    except KeyError:
        raise NotImplementedError(
            f"no lowering for op type {op.op_type!r}") from None
    out = fn(op, ins, ctx)
    return out if isinstance(out, (list, tuple)) else [out]


# ---------------------------------------------------------------------------
# elementwise binary
# ---------------------------------------------------------------------------

_BINARY_FNS = {
    "Add": jnp.add, "Sub": jnp.subtract, "Mul": jnp.multiply,
    "Div": jnp.divide, "Pow": jnp.power, "Min": jnp.minimum,
    "Max": jnp.maximum, "Mod": jnp.mod,
    "Equal": jnp.equal, "Greater": jnp.greater,
    "GreaterOrEqual": jnp.greater_equal, "Less": jnp.less,
    "LessOrEqual": jnp.less_equal,
    "And": jnp.logical_and, "Or": jnp.logical_or, "Xor": jnp.logical_xor,
    "BitwiseAnd": jnp.bitwise_and, "BitwiseOr": jnp.bitwise_or,
    "BitwiseXor": jnp.bitwise_xor,
}


@register(*_BINARY_FNS)
def _binary(op, ins, ctx):
    a, b = ins
    out = _BINARY_FNS[op.op_type](a, b)
    if op.op_type == "Div" and a.dtype in (jnp.int32, jnp.int64, jnp.int8):
        out = out.astype(a.dtype)
    return out


# ---------------------------------------------------------------------------
# elementwise unary
# ---------------------------------------------------------------------------

_UNARY_FNS = {
    "Relu": lambda x: jnp.maximum(x, 0),
    "Gelu": lambda x: jax.nn.gelu(x, approximate=False),
    "Silu": lambda x: jax.nn.silu(x),
    "Sigmoid": jax.nn.sigmoid,
    "HardSigmoid": lambda x: jnp.clip(x / 6.0 + 0.5, 0.0, 1.0),
    "HardSwish": lambda x: x * jnp.clip(x / 6.0 + 0.5, 0.0, 1.0),
    "Tanh": jnp.tanh,
    "Erf": jax.scipy.special.erf,
    "Abs": jnp.abs,
    "Sqrt": jnp.sqrt,
    "Neg": jnp.negative,
    "Exp": jnp.exp,
    "Log": jnp.log,
    "Reciprocal": lambda x: 1.0 / x,
    "Floor": jnp.floor,
    "Ceil": jnp.ceil,
    "Round": jnp.round,
    "Not": jnp.logical_not,
    "Softplus": jax.nn.softplus,
    "Sin": jnp.sin,
    "Cos": jnp.cos,
}


@register(*_UNARY_FNS)
def _unary(op, ins, ctx):
    return _UNARY_FNS[op.op_type](ins[0])


@register("LeakyRelu")
def _leaky_relu(op, ins, ctx):
    alpha = op.attrs.get("alpha", 0.01)
    return jnp.where(ins[0] >= 0, ins[0], ins[0] * alpha)


@register("Elu")
def _elu(op, ins, ctx):
    alpha = op.attrs.get("alpha", 1.0)
    x = ins[0]
    return jnp.where(x >= 0, x, alpha * (jnp.exp(x) - 1.0))


@register("PRelu")
def _prelu(op, ins, ctx):
    x, slope = ins
    return jnp.where(x >= 0, x, x * slope)


@register("Cast")
def _cast(op, ins, ctx):
    return ins[0].astype(DataType.from_onnx(int(op.attrs["to"])).jnp())


@register("CastLike")
def _cast_like(op, ins, ctx):
    return ins[0].astype(ins[1].dtype)


@register("Clip")
def _clip(op, ins, ctx):
    x = ins[0]
    lo = ins[1] if len(ins) > 1 and ins[1] is not None else op.attrs.get("min")
    hi = ins[2] if len(ins) > 2 and ins[2] is not None else op.attrs.get("max")
    if lo is not None:
        x = jnp.maximum(x, lo)
    if hi is not None:
        x = jnp.minimum(x, hi)
    return x


@register("Where")
def _where(op, ins, ctx):
    cond, x, y = ins
    return jnp.where(cond, x, y)


@register("Dropout")
def _dropout(op, ins, ctx):
    # Inference mode: identity (+ all-true mask if requested).
    outs = [ins[0]]
    if len(op.outputs) > 1:
        outs.append(jnp.ones(ins[0].shape, dtype=jnp.bool_))
    return outs


# ---------------------------------------------------------------------------
# matmul family
# ---------------------------------------------------------------------------

def _maybe_transpose_last2(x, do):
    if not do:
        return x
    perm = list(range(x.ndim))
    perm[-1], perm[-2] = perm[-2], perm[-1]
    return jnp.transpose(x, perm)


@register("MatMul")
def _matmul(op, ins, ctx):
    a, b = ins
    a = _maybe_transpose_last2(a, op.attrs.get("transA", False))
    b = _maybe_transpose_last2(b, op.attrs.get("transB", False))
    pref = jnp.float32 if a.dtype in (jnp.bfloat16, jnp.float16, jnp.float32) else None
    out = jnp.matmul(a, b, preferred_element_type=pref)
    return out.astype(a.dtype)


@register("Gemm")
def _gemm(op, ins, ctx):
    a, b = ins[0], ins[1]
    a = _maybe_transpose_last2(a, op.attrs.get("transA", False))
    b = _maybe_transpose_last2(b, op.attrs.get("transB", False))
    y = jnp.matmul(a, b, preferred_element_type=jnp.float32)
    y = y * op.attrs.get("alpha", 1.0)
    if len(ins) > 2 and ins[2] is not None:
        y = y + op.attrs.get("beta", 1.0) * ins[2]
    return y.astype(ins[0].dtype)


@register("MatMulInteger")
def _matmul_integer(op, ins, ctx):
    a, b = ins[0].astype(jnp.int32), ins[1].astype(jnp.int32)
    if len(ins) > 2 and ins[2] is not None:
        a = a - ins[2].astype(jnp.int32)
    if len(ins) > 3 and ins[3] is not None:
        b = b - ins[3].astype(jnp.int32)
    return jnp.matmul(a, b, preferred_element_type=jnp.int32)


#: gathered band intermediate [b, m, 2w+1, k] larger than this switches to
#: the shift-scan formulation (Longformer-scale bands blow HBM otherwise —
#: the reference ships a dedicated band kernel, gbmm_g2bmm.cu; on TPU the
#: scan keeps peak memory at one [b, m, k] buffer per step and XLA keeps
#: the multiply-reduce on the VPU, which matches the op's low arithmetic
#: intensity per output element)
_BAND_GATHER_LIMIT = 1 << 24


def _band_valid(m, off):
    rows = jnp.arange(m)
    tgt = rows + off
    return (tgt >= 0) & (tgt < m)


@register("G2BMM")
def _g2bmm(op, ins, ctx):
    # Band QK^T (Longformer local attention, reference G2BMM.cc): for each row
    # i, dot q_i against k_{i+d*j} for j in [-w, w], zero outside bounds.
    a, b = ins
    w = int(op.attrs["width"])
    d = int(op.attrs.get("dilation", 1))
    bsz, m, k = a.shape
    from infinitensor_tpu.kernels.band import (
        band_kernels_usable, g2bmm_band)
    from infinitensor_tpu.utils.platform import is_tpu, pallas_interpret
    interp = pallas_interpret() and not is_tpu()
    if (ctx.use_pallas or interp) and \
            band_kernels_usable(m, k, w, d, interp):
        # windowed Pallas band kernel: B read ~3x total, no [m,2w+1,k]
        # materialization (kernels/band.py; reference gbmm_g2bmm.cu)
        return g2bmm_band(a, b, w, d, interpret=interp)
    offsets = jnp.arange(-w, w + 1) * d                     # [2w+1]
    if bsz * m * (2 * w + 1) * k <= _BAND_GATHER_LIMIT:
        idx = jnp.arange(m)[:, None] + offsets[None, :]      # [m, 2w+1]
        valid = (idx >= 0) & (idx < m)
        idx_c = jnp.clip(idx, 0, m - 1)
        bk = b[:, idx_c, :]                                  # [b, m, 2w+1, k]
        out = jnp.einsum("bmk,bmnk->bmn", a, bk,
                         preferred_element_type=jnp.float32).astype(a.dtype)
        return jnp.where(valid[None], out, 0)

    af = a.astype(jnp.float32)

    def body(_, off):
        bs = jnp.roll(b, -off, axis=1).astype(jnp.float32)
        col = jnp.sum(af * bs, axis=-1)                      # [b, m]
        return None, jnp.where(_band_valid(m, off)[None], col, 0.0)

    _, cols = lax.scan(body, None, offsets)                  # [2w+1, b, m]
    return jnp.moveaxis(cols, 0, 2).astype(a.dtype)


@register("GBMM")
def _gbmm(op, ins, ctx):
    # Band attention @ V: A [b,m,2w+1] band weights, B [b,m,k] values.
    a, b = ins
    n = a.shape[2]
    w = (n - 1) // 2
    d = int(op.attrs.get("dilation", 1))
    bsz, m, k = b.shape
    from infinitensor_tpu.kernels.band import (
        band_kernels_usable, gbmm_band)
    from infinitensor_tpu.utils.platform import is_tpu, pallas_interpret
    interp = pallas_interpret() and not is_tpu()
    if (ctx.use_pallas or interp) and \
            band_kernels_usable(m, k, w, d, interp):
        return gbmm_band(a, b, w, d, interpret=interp)
    offsets = jnp.arange(-w, w + 1) * d
    if bsz * m * n * k <= _BAND_GATHER_LIMIT:
        idx = jnp.arange(m)[:, None] + offsets[None, :]
        valid = (idx >= 0) & (idx < m)
        idx_c = jnp.clip(idx, 0, m - 1)
        bv = b[:, idx_c, :]                                  # [b, m, 2w+1, k]
        aw = jnp.where(valid[None], a, 0)
        return jnp.einsum("bmn,bmnk->bmk", aw, bv,
                          preferred_element_type=jnp.float32).astype(b.dtype)

    def body(acc, j_off):
        j, off = j_off
        bs = jnp.roll(b, -off, axis=1).astype(jnp.float32)
        aj = lax.dynamic_slice_in_dim(a, j, 1, axis=2)       # [b, m, 1]
        contrib = aj.astype(jnp.float32) * bs                # [b, m, k]
        contrib = jnp.where(_band_valid(m, off)[None, :, None], contrib, 0.0)
        return acc + contrib, None

    acc0 = jnp.zeros((bsz, m, k), jnp.float32)
    acc, _ = lax.scan(body, acc0, (jnp.arange(n), offsets))
    return acc.astype(b.dtype)


# ---------------------------------------------------------------------------
# conv / pool
# ---------------------------------------------------------------------------

def _conv_dnums(nsp):
    chars = "DHW"[3 - nsp:]
    lhs = "NC" + chars
    rhs = "OI" + chars
    return lax.conv_dimension_numbers((0,) * (nsp + 2), (0,) * (nsp + 2),
                                      (lhs, rhs, lhs))


@register("Conv")
def _conv(op, ins, ctx):
    x, w = ins[0], ins[1]
    nsp = x.ndim - 2
    strides = tuple(op.attrs.get("strides", [1] * nsp))
    dilations = tuple(op.attrs.get("dilations", [1] * nsp))
    pads = list(op.attrs.get("pads", [0] * (2 * nsp)))
    padding = [(pads[i], pads[nsp + i]) for i in range(nsp)]
    group = int(op.attrs.get("group", 1))
    out = lax.conv_general_dilated(
        x, w, window_strides=strides, padding=padding,
        rhs_dilation=dilations, dimension_numbers=_conv_dnums(nsp),
        feature_group_count=group,
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    if len(ins) > 2 and ins[2] is not None:  # fused bias
        bias = ins[2].reshape((1, -1) + (1,) * nsp)
        out = out + bias
    act = op.attrs.get("act")
    if act:
        out = _UNARY_FNS[act](out)
    return out


@register("Im2colMatmulConv")
def _im2col_conv(op, ins, ctx):
    """Conv as im2col + MXU matmul (mutator-produced algorithm choice)."""
    x, w = ins[0], ins[1]
    n, c, ih, iw = x.shape
    f, _, kh, kw = w.shape
    nsp = 2
    strides = tuple(op.attrs.get("strides", [1, 1]))
    dilations = tuple(op.attrs.get("dilations", [1, 1]))
    pads = list(op.attrs.get("pads", [0, 0, 0, 0]))
    padding = [(pads[0], pads[2]), (pads[1], pads[3])]
    patches = lax.conv_general_dilated_patches(
        x, (kh, kw), strides, padding, rhs_dilation=dilations,
        dimension_numbers=("NCHW", "OIHW", "NCHW"))   # [N, C*kh*kw, OH, OW]
    oh, ow = patches.shape[2], patches.shape[3]
    cols = patches.reshape(n, c * kh * kw, oh * ow)
    wf = w.reshape(f, c * kh * kw)
    out = jnp.einsum("fk,nko->nfo", wf, cols,
                     preferred_element_type=jnp.float32).astype(x.dtype)
    return out.reshape(n, f, oh, ow)


@register("ConvTranspose")
def _conv_transpose(op, ins, ctx):
    x, w = ins[0], ins[1]
    nsp = x.ndim - 2
    strides = list(op.attrs.get("strides", [1] * nsp))
    dilations = list(op.attrs.get("dilations", [1] * nsp))
    pads = list(op.attrs.get("pads", [0] * (2 * nsp)))
    opads = list(op.attrs.get("output_padding", [0] * nsp))
    group = int(op.attrs.get("group", 1))
    # conv_transpose(x, W) == conv(dilate(x, s), flip(W).swap(O,I)) with
    # padding (k_eff - 1 - pad_begin, k_eff - 1 - pad_end + output_padding).
    w = jnp.flip(w, axis=tuple(range(2, 2 + nsp)))
    if group > 1:
        ci_g = w.shape[0] // group
        w = w.reshape((group, ci_g) + w.shape[1:])
        w = jnp.swapaxes(w, 1, 2)  # [g, co_g, ci_g, ...]
        w = w.reshape((w.shape[0] * w.shape[1], ci_g) + w.shape[3:])
    else:
        w = jnp.swapaxes(w, 0, 1)
    padding = []
    for i in range(nsp):
        k_eff = (w.shape[2 + i] - 1) * dilations[i] + 1
        padding.append((k_eff - 1 - pads[i],
                        k_eff - 1 - pads[nsp + i] + opads[i]))
    out = lax.conv_general_dilated(
        x, w, window_strides=(1,) * nsp, padding=padding,
        lhs_dilation=tuple(strides), rhs_dilation=tuple(dilations),
        dimension_numbers=_conv_dnums(nsp), feature_group_count=group,
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    if len(ins) > 2 and ins[2] is not None:
        out = out + ins[2].reshape((1, -1) + (1,) * nsp)
    return out


def _pool_common(op, x):
    nsp = x.ndim - 2
    kernel = list(op.attrs["kernel_shape"])
    strides = list(op.attrs.get("strides", [1] * nsp))
    dilations = list(op.attrs.get("dilations", [1] * nsp))
    pads = list(op.attrs.get("pads", [0] * (2 * nsp)))
    ceil_mode = bool(op.attrs.get("ceil_mode", 0))
    padding = [(0, 0), (0, 0)]
    for i in range(nsp):
        pb, pe = pads[i], pads[nsp + i]
        if ceil_mode:
            # extend end padding so reduce_window covers the ceil window
            eff_k = (kernel[i] - 1) * dilations[i] + 1
            in_d = x.shape[2 + i]
            out_d = math.ceil((in_d + pb + pe - eff_k) / strides[i]) + 1
            need = (out_d - 1) * strides[i] + eff_k - in_d - pb
            pe = max(pe, need)
        padding.append((pb, pe))
    window = (1, 1, *kernel)
    strides_full = (1, 1, *strides)
    dil_full = (1, 1, *dilations)
    return window, strides_full, dil_full, padding


@register("MaxPool")
def _maxpool(op, ins, ctx):
    x = ins[0]
    window, strides, dils, padding = _pool_common(op, x)
    init = -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min
    return lax.reduce_window(x, init, lax.max, window, strides, padding,
                             window_dilation=dils)


@register("AveragePool")
def _avgpool(op, ins, ctx):
    x = ins[0]
    window, strides, dils, padding = _pool_common(op, x)
    summed = lax.reduce_window(x.astype(jnp.float32), 0.0, lax.add, window,
                               strides, padding, window_dilation=dils)
    if op.attrs.get("count_include_pad", 0):
        count = math.prod(op.attrs["kernel_shape"])
        out = summed / count
    else:
        ones = jnp.ones(x.shape, jnp.float32)
        count = lax.reduce_window(ones, 0.0, lax.add, window, strides, padding,
                                  window_dilation=dils)
        out = summed / count
    return out.astype(x.dtype)


@register("GlobalAveragePool")
def _gap(op, ins, ctx):
    x = ins[0]
    axes = tuple(range(2, x.ndim))
    return jnp.mean(x.astype(jnp.float32), axis=axes, keepdims=True).astype(x.dtype)


@register("GlobalMaxPool")
def _gmp(op, ins, ctx):
    x = ins[0]
    return jnp.max(x, axis=tuple(range(2, x.ndim)), keepdims=True)


# ---------------------------------------------------------------------------
# normalization / softmax
# ---------------------------------------------------------------------------

@register("BatchNormalization")
def _batchnorm(op, ins, ctx):
    x, scale, bias, mean, var = ins
    eps = op.attrs.get("epsilon", 1e-5)
    shape = (1, -1) + (1,) * (x.ndim - 2)
    x32 = x.astype(jnp.float32)
    out = (x32 - mean.astype(jnp.float32).reshape(shape)) * lax.rsqrt(
        var.astype(jnp.float32).reshape(shape) + eps)
    return (out * scale.reshape(shape) + bias.reshape(shape)).astype(x.dtype)


@register("LayerNormalization")
def _layernorm(op, ins, ctx):
    x = ins[0]
    scale = ins[1] if len(ins) > 1 else None
    bias = ins[2] if len(ins) > 2 else None
    axis = op.attrs.get("axis", -1)
    axis = axis + x.ndim if axis < 0 else axis
    axes = tuple(range(axis, x.ndim))
    eps = op.attrs.get("epsilon", 1e-5)
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=axes, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=axes, keepdims=True)
    out = (x32 - mean) * lax.rsqrt(var + eps)
    if scale is not None:
        out = out * scale.astype(jnp.float32)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(x.dtype)


@register("InstanceNormalization")
def _instancenorm(op, ins, ctx):
    x, scale, bias = ins
    eps = op.attrs.get("epsilon", 1e-5)
    axes = tuple(range(2, x.ndim))
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=axes, keepdims=True)
    var = jnp.var(x32, axis=axes, keepdims=True)
    shape = (1, -1) + (1,) * (x.ndim - 2)
    out = (x32 - mean) * lax.rsqrt(var + eps)
    return (out * scale.reshape(shape) + bias.reshape(shape)).astype(x.dtype)


@register("RMSNorm")
def _rmsnorm(op, ins, ctx):
    x, w = ins
    eps = op.attrs.get("epsilon", 1e-6)
    if ctx.use_pallas:
        from infinitensor_tpu.kernels.norms import rmsnorm as pallas_rmsnorm
        return pallas_rmsnorm(x, w, eps=eps)
    x32 = x.astype(jnp.float32)
    ms = jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
    return (x32 * lax.rsqrt(ms + eps) * w.astype(jnp.float32)).astype(x.dtype)


@register("LRN")
def _lrn(op, ins, ctx):
    x = ins[0]
    alpha = op.attrs.get("alpha", 1e-4)
    beta = op.attrs.get("beta", 0.75)
    bias = op.attrs.get("bias", 1.0)
    size = int(op.attrs["size"])
    x32 = x.astype(jnp.float32)
    sq = jnp.square(x32)
    pb = (size - 1) // 2
    pe = size - 1 - pb
    window = (1, size) + (1,) * (x.ndim - 2)
    padding = [(0, 0), (pb, pe)] + [(0, 0)] * (x.ndim - 2)
    sums = lax.reduce_window(sq, 0.0, lax.add, window, (1,) * x.ndim, padding)
    return (x32 / jnp.power(bias + (alpha / size) * sums, beta)).astype(x.dtype)


@register("Softmax")
def _softmax(op, ins, ctx):
    axis = op.attrs.get("axis", -1)
    x = ins[0]
    return jax.nn.softmax(x.astype(jnp.float32), axis=axis).astype(x.dtype)


@register("LogSoftmax")
def _log_softmax(op, ins, ctx):
    axis = op.attrs.get("axis", -1)
    x = ins[0]
    return jax.nn.log_softmax(x.astype(jnp.float32), axis=axis).astype(x.dtype)


# ---------------------------------------------------------------------------
# shape manipulation
# ---------------------------------------------------------------------------

@register("Reshape")
def _reshape(op, ins, ctx):
    return ins[0].reshape(op.outputs[0].shape)


@register("Flatten", "Squeeze", "Unsqueeze")
def _reshape_like(op, ins, ctx):
    return ins[0].reshape(op.outputs[0].shape)


@register("Identity")
def _identity_l(op, ins, ctx):
    return ins[0]


@register("Shape")
def _shape_l(op, ins, ctx):
    # Mostly constant-folded by the importer; int64 degrades to int32 when
    # x64 is disabled, which is fine for shape arithmetic.
    x = ins[0]
    start = op.attrs.get("start", 0)
    end = op.attrs.get("end", x.ndim)
    return jnp.array(x.shape[start:end], dtype=jnp.int64)


@register("Transpose")
def _transpose_l(op, ins, ctx):
    perm = op.attrs.get("perm") or list(reversed(range(ins[0].ndim)))
    return jnp.transpose(ins[0], perm)


@register("Concat")
def _concat_l(op, ins, ctx):
    return jnp.concatenate([x for x in ins if x is not None],
                           axis=op.attrs["axis"])


@register("Split")
def _split_l(op, ins, ctx):
    x = ins[0]
    axis = op.attrs["axis"]
    sizes = [o.shape[axis if axis >= 0 else axis + x.ndim] for o in op.outputs]
    idx = []
    acc = 0
    for s in sizes[:-1]:
        acc += s
        idx.append(acc)
    return list(jnp.split(x, idx, axis=axis))


@register("Slice")
def _slice_l(op, ins, ctx):
    x = ins[0]
    axes = op.attrs.get("axes") or list(range(len(op.attrs["starts"])))
    axes = [a + x.ndim if a < 0 else a for a in axes]
    starts = list(op.attrs["starts"])
    ends = list(op.attrs["ends"])
    steps = list(op.attrs.get("steps") or [1] * len(axes))
    slicer = [slice(None)] * x.ndim
    for a, s, e, st in zip(axes, starts, ends, steps):
        d = x.shape[a]
        s = None if s is None else (max(s + d, 0) if s < 0 else min(s, d))
        if st > 0:
            e = None if e is None else (max(e + d, 0) if e < 0 else min(e, d))
        else:
            e = None if e <= -d - 1 else (e + d if e < 0 else min(e, d))
            if e is not None and e < 0:
                e = None
        slicer[a] = slice(s, e, st)
    return x[tuple(slicer)]


@register("Pad")
def _pad_l(op, ins, ctx):
    x = ins[0]
    pads = list(op.attrs["pads"])
    r = x.ndim
    mode = op.attrs.get("mode", "constant")
    value = op.attrs.get("value", 0.0)
    pos = [(max(pads[i], 0), max(pads[r + i], 0)) for i in range(r)]
    neg = [(min(pads[i], 0), min(pads[r + i], 0)) for i in range(r)]
    if any(p != (0, 0) for p in pos):
        if mode == "constant":
            x = jnp.pad(x, pos, constant_values=value)
        elif mode == "reflect":
            x = jnp.pad(x, pos, mode="reflect")
        elif mode == "edge":
            x = jnp.pad(x, pos, mode="edge")
        else:
            raise NotImplementedError(f"Pad mode {mode}")
    if any(n != (0, 0) for n in neg):
        slicer = tuple(slice(-nb, x.shape[i] + ne if ne < 0 else None)
                       for i, (nb, ne) in enumerate(neg))
        x = x[slicer]
    return x


@register("Resize")
def _resize_l(op, ins, ctx):
    x = ins[0]
    out_shape = tuple(op.attrs["out_shape"])
    mode = op.attrs.get("mode", "nearest")
    method = {"nearest": "nearest", "linear": "linear", "cubic": "cubic"}[mode]
    return jax.image.resize(x, out_shape, method=method).astype(x.dtype)


@register("Expand")
def _expand_l(op, ins, ctx):
    return jnp.broadcast_to(ins[0], op.outputs[0].shape)


@register("Tile")
def _tile_l(op, ins, ctx):
    return jnp.tile(ins[0], list(op.attrs["repeats"]))


@register("Gather")
def _gather_l(op, ins, ctx):
    data, idx = ins
    return jnp.take(data, idx.astype(jnp.int32), axis=op.attrs.get("axis", 0))


@register("GatherElements")
def _gather_elements_l(op, ins, ctx):
    data, idx = ins
    return jnp.take_along_axis(data, idx.astype(jnp.int32),
                               axis=op.attrs.get("axis", 0))


@register("ScatterElements")
def _scatter_elements_l(op, ins, ctx):
    data, idx, updates = ins
    axis = op.attrs.get("axis", 0)
    idx = idx.astype(jnp.int32)
    # Build full index grid for scatter along one axis.
    def one_axis_scatter(d, i, u):
        dims = jnp.indices(i.shape)
        index_list = [dims[k] for k in range(i.ndim)]
        index_list[axis] = i
        return d.at[tuple(index_list)].set(u)
    return one_axis_scatter(data, idx, updates)


_REDUCE_FNS = {
    "ReduceMean": jnp.mean, "ReduceSum": jnp.sum, "ReduceMax": jnp.max,
    "ReduceMin": jnp.min, "ReduceProd": jnp.prod,
}


@register(*_REDUCE_FNS, "ReduceL2")
def _reduce_l(op, ins, ctx):
    x = ins[0]
    axes = op.attrs.get("axes")
    axes = tuple(a + x.ndim if a < 0 else a for a in axes) if axes else None
    keep = bool(op.attrs.get("keepdims", 1))
    if op.op_type == "ReduceL2":
        return jnp.sqrt(jnp.sum(jnp.square(x.astype(jnp.float32)), axis=axes,
                                keepdims=keep)).astype(x.dtype)
    fn = _REDUCE_FNS[op.op_type]
    if op.op_type == "ReduceMean" and jnp.issubdtype(x.dtype, jnp.floating):
        return fn(x.astype(jnp.float32), axis=axes, keepdims=keep).astype(x.dtype)
    return fn(x, axis=axes, keepdims=keep)


@register("ArgMax")
def _argmax_l(op, ins, ctx):
    x = ins[0]
    axis = op.attrs.get("axis", 0)
    out = jnp.argmax(x, axis=axis, keepdims=bool(op.attrs.get("keepdims", 1)))
    return out.astype(jnp.int32)


@register("ArgMin")
def _argmin_l(op, ins, ctx):
    x = ins[0]
    axis = op.attrs.get("axis", 0)
    out = jnp.argmin(x, axis=axis, keepdims=bool(op.attrs.get("keepdims", 1)))
    return out.astype(jnp.int32)


@register("DepthToSpace")
def _depth_to_space_l(op, ins, ctx):
    x = ins[0]
    b = int(op.attrs["blocksize"])
    n, c, h, w = x.shape
    mode = op.attrs.get("mode", "DCR")
    if mode == "DCR":
        x = x.reshape(n, b, b, c // (b * b), h, w)
        x = jnp.transpose(x, (0, 3, 4, 1, 5, 2))
    else:  # CRD
        x = x.reshape(n, c // (b * b), b, b, h, w)
        x = jnp.transpose(x, (0, 1, 4, 2, 5, 3))
    return x.reshape(n, c // (b * b), h * b, w * b)


@register("SpaceToDepth")
def _space_to_depth_l(op, ins, ctx):
    x = ins[0]
    b = int(op.attrs["blocksize"])
    n, c, h, w = x.shape
    x = x.reshape(n, c, h // b, b, w // b, b)
    x = jnp.transpose(x, (0, 3, 5, 1, 2, 4))
    return x.reshape(n, c * b * b, h // b, w // b)


@register("ConstantOfShape")
def _constant_of_shape_l(op, ins, ctx):
    shape = tuple(op.attrs["shape"])
    dtype = DataType.from_onnx(int(op.attrs.get("dtype", dt.FLOAT32.onnx_id)))
    return jnp.full(shape, op.attrs.get("value", 0), dtype=dtype.jnp())


@register("Range")
def _range_l(op, ins, ctx):
    dtype = DataType.from_onnx(int(op.attrs.get("dtype", dt.INT64.onnx_id)))
    return jnp.arange(op.attrs["start"], op.attrs["limit"],
                      op.attrs.get("delta", 1)).astype(dtype.jnp())


# ---------------------------------------------------------------------------
# LLM ops
# ---------------------------------------------------------------------------

@register("RoPE")
def _rope_l(op, ins, ctx):
    """Rotary position embedding, reference semantics
    (src/kernels/cuda/rope.cu:17-31): rotate-half with theta base 10000,
    freq computed per head of size dim_head over the last dim.

    pos: integer positions, broadcastable to x's leading dims.
    x: [..., dim_model] where dim_model = n_heads * dim_head.
    """
    pos, x = ins
    dim_head = int(op.attrs.get("dim_head", 64))
    *lead, dim_model = x.shape
    half = dim_head // 2
    xs = x.reshape(*lead, dim_model // dim_head, dim_head)
    x1 = xs[..., :half]
    x2 = xs[..., half:]
    base = float(op.attrs.get("theta", 10000.0))
    inv_freq = jnp.power(base, -jnp.arange(0, half, dtype=jnp.float32) * 2.0 / dim_head)
    # pos broadcast: [...,] -> [..., 1, 1]
    theta = pos.astype(jnp.float32)[..., None, None] * inv_freq
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    o1 = x1.astype(jnp.float32) * cos - x2.astype(jnp.float32) * sin
    o2 = x2.astype(jnp.float32) * cos + x1.astype(jnp.float32) * sin
    out = jnp.concatenate([o1, o2], axis=-1).astype(x.dtype)
    return out.reshape(*lead, dim_model)


@register("AttentionKVCache")
def _attention_kvcache_l(op, ins, ctx):
    """Fused decode attention (reference attention_kvcache.cu semantics):
    append k/v at `position`, causal attention of the single query over
    cache[0..position]. Functional: returns (attn_out, k_cache, v_cache).
    """
    k_cache, v_cache, q, k, v, pos = ins
    from infinitensor_tpu.kernels.attention import (
        decode_attention_gqa, decode_attention_ref)
    if q.shape[1] != k_cache.shape[1] or ctx.use_pallas:
        # GQA (H != Hkv) or TPU: the grouped wrapper handles both (rep=1
        # degenerates to MHA) and picks flash_decode on-device
        out, kc, vc = decode_attention_gqa(k_cache, v_cache, q, k, v, pos)
    else:
        out, kc, vc = decode_attention_ref(k_cache, v_cache, q, k, v, pos)
    if len(op.outputs) >= 3:
        return [out, kc, vc]
    return [out]


@register("AttentionKVCacheQ8")
def _attention_kvcache_q8_l(op, ins, ctx):
    """INT8-KV-cache GQA decode attention (ops/shape_rules.py docstring);
    the kernel wrapper routes to Pallas flash_decode_q8 on TPU and the
    jnp oracle elsewhere."""
    from infinitensor_tpu.kernels.attention import decode_attention_gqa_q8
    kc, vc, ks, vs, q, k, v, pos = ins
    out, kc, vc, ks, vs = decode_attention_gqa_q8(kc, vc, ks, vs, q, k, v,
                                                  pos)
    return [out, kc, vc, ks, vs]


@register("MatMulWOQ")
def _matmul_woq_l(op, ins, ctx):
    """Weight-only-quantized matmul; reconstructs the QuantizedLinear
    container from graph tensors + attrs and calls the Pallas dequant
    kernels (jnp fallback off-TPU). With a 4th input the RMSNorm fuses
    into the kernel (quant_matmul_norm)."""
    from infinitensor_tpu.kernels.quant_matmul import (
        quant_matmul, quant_matmul_norm)
    from infinitensor_tpu.quant.weight_only import QuantizedLinear
    x, qw, sc = ins[0], ins[1], ins[2]
    a = op.attrs
    q = QuantizedLinear(qw, sc, int(a["bits"]), int(a["group_size"]),
                        int(a.get("out_logical", 0)))
    if len(ins) > 3 and ins[3] is not None:
        norm_w = ins[3].reshape(-1)
        return quant_matmul_norm(x, norm_w, q,
                                 eps=float(a.get("eps", 1e-5)))
    return quant_matmul(x, q)


# ---------------------------------------------------------------------------
# quantization
# ---------------------------------------------------------------------------

def _qdq_axis_reshape(scale, x_ndim, axis):
    if scale.ndim == 0:
        return scale
    shape = [1] * x_ndim
    shape[axis] = scale.shape[0]
    return scale.reshape(shape)


@register("QuantizeLinear")
def _quantize_linear_l(op, ins, ctx):
    x, scale = ins[0], ins[1]
    zp = ins[2] if len(ins) > 2 and ins[2] is not None else None
    axis = op.attrs.get("axis", 1)
    scale = _qdq_axis_reshape(scale, x.ndim, axis)
    q = jnp.round(x / scale)
    if zp is not None:
        q = q + _qdq_axis_reshape(zp, x.ndim, axis).astype(jnp.float32)
        info = jnp.iinfo(zp.dtype)
        return jnp.clip(q, info.min, info.max).astype(zp.dtype)
    return jnp.clip(q, 0, 255).astype(jnp.uint8)


@register("DequantizeLinear")
def _dequantize_linear_l(op, ins, ctx):
    x, scale = ins[0], ins[1]
    zp = ins[2] if len(ins) > 2 and ins[2] is not None else None
    axis = op.attrs.get("axis", 1)
    xf = x.astype(jnp.float32)
    if zp is not None:
        xf = xf - _qdq_axis_reshape(zp, x.ndim, axis).astype(jnp.float32)
    return xf * _qdq_axis_reshape(scale, x.ndim, axis)


@register("DynamicQuantizeLinear")
def _dynamic_quantize_linear_l(op, ins, ctx):
    x = ins[0].astype(jnp.float32)
    xmin = jnp.minimum(jnp.min(x), 0.0)
    xmax = jnp.maximum(jnp.max(x), 0.0)
    scale = (xmax - xmin) / 255.0
    zp = jnp.clip(jnp.round(-xmin / scale), 0, 255).astype(jnp.uint8)
    y = jnp.clip(jnp.round(x / scale) + zp.astype(jnp.float32), 0, 255)
    return [y.astype(jnp.uint8), scale, zp]


# ---------------------------------------------------------------------------
# collectives (valid only inside shard_map; reference NCCL kernel analogs)
# ---------------------------------------------------------------------------

@register("AllReduceSum")
def _ar_sum(op, ins, ctx):
    return lax.psum(ins[0], op.attrs.get("axis_name", ctx.axis_name))


@register("AllReduceProd")
def _ar_prod(op, ins, ctx):
    ax = op.attrs.get("axis_name", ctx.axis_name)
    return jnp.exp(lax.psum(jnp.log(ins[0]), ax))  # no pprod primitive


@register("AllReduceMin")
def _ar_min(op, ins, ctx):
    return lax.pmin(ins[0], op.attrs.get("axis_name", ctx.axis_name))


@register("AllReduceMax")
def _ar_max(op, ins, ctx):
    return lax.pmax(ins[0], op.attrs.get("axis_name", ctx.axis_name))


@register("AllReduceAvg")
def _ar_avg(op, ins, ctx):
    ax = op.attrs.get("axis_name", ctx.axis_name)
    return lax.pmean(ins[0], ax)


@register("AllGather")
def _ag(op, ins, ctx):
    ax = op.attrs.get("axis_name", ctx.axis_name)
    gathered = lax.all_gather(ins[0], ax)  # [world, ...]
    return [gathered[i] for i in range(int(op.attrs["world_size"]))]


@register("ReduceScatterSum")
def _rs(op, ins, ctx):
    ax = op.attrs.get("axis_name", ctx.axis_name)
    return lax.psum_scatter(ins[0], ax, scatter_dimension=op.attrs.get("axis", 0),
                            tiled=True)


@register("AllToAll")
def _a2a(op, ins, ctx):
    ax = op.attrs.get("axis_name", ctx.axis_name)
    return lax.all_to_all(ins[0], ax, split_axis=op.attrs["split_axis"],
                          concat_axis=op.attrs["concat_axis"], tiled=True)


@register("Broadcast")
def _bcast(op, ins, ctx):
    ax = op.attrs.get("axis_name", ctx.axis_name)
    root = int(op.attrs.get("root", 0))
    x = ins[0]
    idx = lax.axis_index(ax)
    masked = jnp.where(idx == root, x, jnp.zeros_like(x))
    return lax.psum(masked, ax)


@register("Send")
def _send_l(op, ins, ctx):
    ax = op.attrs.get("axis_name", ctx.axis_name)
    src, dst = int(op.attrs["source"]), int(op.attrs["destination"])
    return lax.ppermute(ins[0], ax, perm=[(src, dst)])


@register("Recv")
def _recv_l(op, ins, ctx):
    # Paired with Send in the same program: ppermute already delivers the
    # value; Recv becomes identity on the permuted value when present, else
    # zeros (matching the reference's separate-op graph structure this is
    # fused at planning time).
    if ins and ins[0] is not None:
        return ins[0]
    shape = tuple(op.attrs["shape"])
    dtype = DataType.from_onnx(int(op.attrs["dtype"]))
    return jnp.zeros(shape, dtype=dtype.jnp())


# ---------------------------------------------------------------------------
# expression op (EinNet analog)
# ---------------------------------------------------------------------------

@register("MemBound")
def _membound_l(op, ins, ctx):
    from infinitensor_tpu.nnet.evaluator import evaluate_expr
    return evaluate_expr(op.attrs["expr"], ins)


# ---------------------------------------------------------------------------
# straggler ops from the reference enum
# ---------------------------------------------------------------------------

_UNARY_FNS.update({
    "Tan": jnp.tan,
    "Asin": jnp.arcsin,
    "Acos": jnp.arccos,
    "Atan": jnp.arctan,
    "Sinh": jnp.sinh,
    "Cosh": jnp.cosh,
    "Softsign": lambda x: x / (1.0 + jnp.abs(x)),
    "Sign": jnp.sign,
    "BitwiseNot": jnp.invert,
})
for _n in ("Tan", "Asin", "Acos", "Atan", "Sinh", "Cosh", "Softsign",
           "Sign", "BitwiseNot"):
    LOWERINGS[_n] = _unary


@register("Det")
def _det_l(op, ins, ctx):
    x = ins[0]
    mode = op.attrs.get("mode", 0)  # 0 = det, 1 = logdet (reference det.h:7)
    d = jnp.linalg.det(x.astype(jnp.float32)).astype(x.dtype)
    if mode == 1:
        d = jnp.log(jnp.abs(d))
    if x.ndim == 2:
        d = d.reshape(1)
    return [d]


@register("Extend")
def _extend_l(op, ins, ctx):
    x = ins[0]
    dim = int(op.attrs["dim"]) % x.ndim
    num = int(op.attrs.get("num", 1))
    return [jnp.concatenate([x] * (num + 1), axis=dim)]


@register("TopK")
def _topk_l(op, ins, ctx):
    x = ins[0]
    k = int(op.attrs["k"])
    axis = int(op.attrs.get("axis", -1)) % x.ndim
    largest = int(op.attrs.get("largest", 1))
    moved = jnp.moveaxis(x, axis, -1)
    vals, idx = jax.lax.top_k(moved if largest else -moved, k)
    if not largest:
        vals = -vals
    return [jnp.moveaxis(vals, -1, axis),
            jnp.moveaxis(idx.astype(jnp.int64), -1, axis)]


@register("CumSum")
def _cumsum_l(op, ins, ctx):
    x = ins[0]
    axis = int(op.attrs.get("axis", 0))
    if len(ins) > 1 and ins[1] is not None:
        axis = int(ins[1])  # ONNX passes axis as an input tensor
    exclusive = int(op.attrs.get("exclusive", 0))
    reverse = int(op.attrs.get("reverse", 0))
    if reverse:
        x = jnp.flip(x, axis)
    out = jnp.cumsum(x, axis=axis, dtype=x.dtype)
    if exclusive:
        out = out - x
    if reverse:
        out = jnp.flip(out, axis)
    return [out]


@register("Trilu")
def _trilu_l(op, ins, ctx):
    x = ins[0]
    k = int(ins[1]) if len(ins) > 1 and ins[1] is not None else \
        int(op.attrs.get("k", 0))
    upper = int(op.attrs.get("upper", 1))
    return [jnp.triu(x, k) if upper else jnp.tril(x, k)]


@register("OneHot")
def _onehot_l(op, ins, ctx):
    idx = ins[0]
    depth = int(op.attrs["depth"])
    axis = int(op.attrs.get("axis", -1))
    off_v, on_v = op.attrs.get("off_value", 0.0), op.attrs.get("on_value", 1.0)
    oh = jax.nn.one_hot(idx % depth, depth, axis=axis if axis >= 0 else -1)
    if axis < 0 and axis != -1:
        oh = jnp.moveaxis(oh, -1, axis)
    return [(oh * (on_v - off_v) + off_v)]


@register("ReduceL1")
def _reduce_l1_l(op, ins, ctx):
    axes = op.attrs.get("axes")
    keep = bool(op.attrs.get("keepdims", 1))
    axes = tuple(int(a) for a in axes) if axes is not None else None
    return [jnp.sum(jnp.abs(ins[0]), axis=axes, keepdims=keep)]


@register("ReluBackward")
def _relu_backward_l(op, ins, ctx):
    y, dy, x = ins
    return [jnp.where(x > 0, dy, 0)]


@register("SigmoidBackward")
def _sigmoid_backward_l(op, ins, ctx):
    y, dy, x = ins
    return [dy * y * (1 - y)]


@register("TanhBackward")
def _tanh_backward_l(op, ins, ctx):
    y, dy, x = ins
    return [dy * (1 - y * y)]


@register("SkipRMSNorm")
def _skip_rmsnorm_l(op, ins, ctx):
    # Fused residual-add + RMSNorm (appears in optimized serving graphs):
    # outputs (normed, residual_sum).
    from infinitensor_tpu.kernels.norms import rmsnorm
    x, residual, g = ins[0], ins[1], ins[2]
    s = x + residual
    eps = float(op.attrs.get("epsilon", 1e-6))
    out = rmsnorm(s, g, eps=eps)
    return [out, s] if len(op.outputs) > 1 else [out]


# ---------------------------------------------------------------------------
# ONNX coverage beyond the reference importer's 68 ops (widening pass)
# ---------------------------------------------------------------------------

_UNARY_FNS.update({
    "Asinh": jnp.arcsinh,
    "Acosh": jnp.arccosh,
    "Atanh": jnp.arctanh,
    "Rsqrt": lax.rsqrt,
    "Square": jnp.square,
    "Mish": lambda x: x * jnp.tanh(jax.nn.softplus(x)),
    "IsNaN": jnp.isnan,
})
for _n in ("Asinh", "Acosh", "Atanh", "Rsqrt", "Square", "Mish", "IsNaN"):
    LOWERINGS[_n] = _unary


@register("IsInf")
def _isinf_l(op, ins, ctx):
    x = ins[0]
    neg = bool(op.attrs.get("detect_negative", 1))
    pos = bool(op.attrs.get("detect_positive", 1))
    out = jnp.zeros(x.shape, jnp.bool_)
    if pos:
        out = out | (x == jnp.inf)
    if neg:
        out = out | (x == -jnp.inf)
    return out

_BINARY_FNS.update({
    "FloorDiv": jnp.floor_divide,
    "FloorMod": lambda a, b: a - jnp.floor_divide(a, b) * b,
    "SquaredDifference": lambda a, b: jnp.square(a - b),
})
for _n in ("FloorDiv", "FloorMod", "SquaredDifference"):
    LOWERINGS[_n] = _binary


@register("Selu")
def _selu_l(op, ins, ctx):
    a = float(op.attrs.get("alpha", 1.67326319217681884765625))
    g = float(op.attrs.get("gamma", 1.05070102214813232421875))
    x = ins[0]
    return g * jnp.where(x > 0, x, a * (jnp.exp(x) - 1.0))


@register("Celu")
def _celu_l(op, ins, ctx):
    a = float(op.attrs.get("alpha", 1.0))
    x = ins[0]
    return jnp.maximum(x, 0) + jnp.minimum(0, a * (jnp.exp(x / a) - 1.0))


@register("ThresholdedRelu")
def _thresholded_relu_l(op, ins, ctx):
    a = float(op.attrs.get("alpha", 1.0))
    return jnp.where(ins[0] > a, ins[0], 0)


@register("Shrink")
def _shrink_l(op, ins, ctx):
    lambd = float(op.attrs.get("lambd", 0.5))
    bias = float(op.attrs.get("bias", 0.0))
    x = ins[0]
    return jnp.where(x < -lambd, x + bias,
                     jnp.where(x > lambd, x - bias, 0))


@register("Hardtanh")
def _hardtanh_l(op, ins, ctx):
    lo = float(op.attrs.get("min_val", -1.0))
    hi = float(op.attrs.get("max_val", 1.0))
    return jnp.clip(ins[0], lo, hi)


@register("Hardmax")
def _hardmax_l(op, ins, ctx):
    x = ins[0]
    axis = int(op.attrs.get("axis", -1))
    return jax.nn.one_hot(jnp.argmax(x, axis=axis), x.shape[axis],
                          axis=axis, dtype=x.dtype)


@register("Sum", "MeanN")
def _variadic_l(op, ins, ctx):
    out = ins[0]
    for x in ins[1:]:
        out = out + x
    if op.op_type == "MeanN":
        out = out / len(ins)
    return out


@register("ReduceLogSum", "ReduceLogSumExp", "ReduceSumSquare")
def _reduce_more_l(op, ins, ctx):
    x = ins[0]
    axes = op.attrs.get("axes")
    axes = tuple(a + x.ndim if a < 0 else a for a in axes) if axes else None
    keep = bool(op.attrs.get("keepdims", 1))
    xf = x.astype(jnp.float32) if jnp.issubdtype(x.dtype, jnp.floating) else x
    if op.op_type == "ReduceLogSum":
        out = jnp.log(jnp.sum(xf, axis=axes, keepdims=keep))
    elif op.op_type == "ReduceLogSumExp":
        out = jax.scipy.special.logsumexp(xf, axis=axes, keepdims=keep)
    else:
        out = jnp.sum(jnp.square(xf), axis=axes, keepdims=keep)
    return out.astype(x.dtype)


@register("Einsum")
def _einsum_l(op, ins, ctx):
    return jnp.einsum(op.attrs["equation"], *ins)


@register("GatherND")
def _gather_nd_l(op, ins, ctx):
    data, idx = ins[0], ins[1].astype(jnp.int32)
    b = int(op.attrs.get("batch_dims", 0))
    if b == 0:
        return data[tuple(jnp.moveaxis(idx, -1, 0))]
    # prepend broadcast batch index grids for the leading b dims
    grids = jnp.meshgrid(*(jnp.arange(d) for d in idx.shape[:-1]),
                         indexing="ij")
    coords = [g for g in grids[:b]] + list(jnp.moveaxis(idx, -1, 0))
    return data[tuple(coords)]


@register("ScatterND")
def _scatter_nd_l(op, ins, ctx):
    data, idx, updates = ins
    reduction = op.attrs.get("reduction", "none")
    coords = tuple(jnp.moveaxis(idx.astype(jnp.int32), -1, 0))
    at = data.at[coords]
    if reduction == "add":
        return at.add(updates)
    if reduction == "mul":
        return at.multiply(updates)
    if reduction == "max":
        return at.max(updates)
    if reduction == "min":
        return at.min(updates)
    return at.set(updates)


@register("GroupNormalization")
def _group_norm_l(op, ins, ctx):
    x, scale, bias = ins
    g = int(op.attrs["num_groups"])
    eps = float(op.attrs.get("epsilon", 1e-5))
    n, c = x.shape[0], x.shape[1]
    xf = x.astype(jnp.float32).reshape((n, g, c // g, *x.shape[2:]))
    axes = tuple(range(2, xf.ndim))
    mean = jnp.mean(xf, axis=axes, keepdims=True)
    var = jnp.var(xf, axis=axes, keepdims=True)
    xn = ((xf - mean) / jnp.sqrt(var + eps)).reshape(x.shape)
    shape = (1, c) + (1,) * (x.ndim - 2)
    return (xn * scale.reshape(shape).astype(jnp.float32)
            + bias.reshape(shape).astype(jnp.float32)).astype(x.dtype)


@register("MeanVarianceNormalization")
def _mvn_l(op, ins, ctx):
    x = ins[0]
    axes = tuple(op.attrs.get("axes", (0, 2, 3)))
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=axes, keepdims=True)
    std = jnp.std(xf, axis=axes, keepdims=True)
    return ((xf - mean) / (std + 1e-9)).astype(x.dtype)


@register("LpNormalization")
def _lp_norm_l(op, ins, ctx):
    x = ins[0]
    axis = int(op.attrs.get("axis", -1))
    p = int(op.attrs.get("p", 2))
    xf = x.astype(jnp.float32)
    if p == 1:
        norm = jnp.sum(jnp.abs(xf), axis=axis, keepdims=True)
    else:
        norm = jnp.sqrt(jnp.sum(jnp.square(xf), axis=axis, keepdims=True))
    return (xf / jnp.maximum(norm, 1e-12)).astype(x.dtype)


@register("LpPool", "GlobalLpPool")
def _lp_pool_l(op, ins, ctx):
    x = ins[0]
    p = int(op.attrs.get("p", 2))
    xf = jnp.abs(x.astype(jnp.float32)) ** p
    if op.op_type == "GlobalLpPool":
        s = jnp.sum(xf, axis=tuple(range(2, x.ndim)), keepdims=True)
        return (s ** (1.0 / p)).astype(x.dtype)
    nsp = x.ndim - 2
    kernel = list(op.attrs["kernel_shape"])
    strides = list(op.attrs.get("strides", [1] * nsp))
    pads = list(op.attrs.get("pads", [0] * 2 * nsp))
    window = (1, 1, *kernel)
    stride = (1, 1, *strides)
    padding = [(0, 0), (0, 0)] + [(pads[i], pads[nsp + i])
                                  for i in range(nsp)]
    s = lax.reduce_window(xf, 0.0, lax.add, window, stride, padding)
    return (s ** (1.0 / p)).astype(x.dtype)


@register("EyeLike")
def _eye_like_l(op, ins, ctx):
    x = ins[0]
    k = int(op.attrs.get("k", 0))
    dtype = op.outputs[0].dtype.jnp()
    return jnp.eye(x.shape[0], x.shape[1], k=k, dtype=dtype)


def _op_rng_key(op):
    seed = op.attrs.get("seed")
    if seed is None:
        # deterministic per-op fallback (ONNX leaves seedless behavior
        # implementation-defined; traced graphs need a static key)
        seed = hash(op.attrs.get("_name", op.op_type)) % (2 ** 31)
    return jax.random.PRNGKey(int(seed) & 0x7FFFFFFF)


@register("RandomNormal", "RandomNormalLike")
def _random_normal_l(op, ins, ctx):
    shape = op.outputs[0].shape
    dtype = op.outputs[0].dtype.jnp()
    mean = float(op.attrs.get("mean", 0.0))
    scale = float(op.attrs.get("scale", 1.0))
    return (jax.random.normal(_op_rng_key(op), shape) * scale
            + mean).astype(dtype)


@register("RandomUniform", "RandomUniformLike")
def _random_uniform_l(op, ins, ctx):
    shape = op.outputs[0].shape
    dtype = op.outputs[0].dtype.jnp()
    lo = float(op.attrs.get("low", 0.0))
    hi = float(op.attrs.get("high", 1.0))
    return jax.random.uniform(_op_rng_key(op), shape, jnp.float32,
                              lo, hi).astype(dtype)


@register("Bernoulli")
def _bernoulli_l(op, ins, ctx):
    p = ins[0].astype(jnp.float32)
    dtype = op.outputs[0].dtype.jnp()
    u = jax.random.uniform(_op_rng_key(op), p.shape)
    return (u < p).astype(dtype)


LOWERINGS["Upsample"] = LOWERINGS["Resize"]
