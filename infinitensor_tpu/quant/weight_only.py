"""Weight-only INT8/INT4 quantization for serving.

The BASELINE north star: INT8/INT4 weight-only dequant+matmul at
speed-of-light. Layout decisions are TPU-driven:

* per-(group, out-channel) symmetric scales; group along the contraction
  axis (``group_size`` input rows share a scale) — the standard weight-only
  scheme that keeps the matmul epilogue a cheap rescale;
* INT4 packed two-nibbles-per-int8 along the contraction axis, unpacked
  in-kernel (Pallas) or via bit ops (jnp fallback);
* activations stay bf16; the MXU consumes bf16 x int8->bf16 directly, so the
  jnp path casts weights and lets XLA fuse the scale multiply.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp

from infinitensor_tpu.utils.platform import is_tpu
import numpy as np

# On-the-wire layout version of the packed-int4 qweight bytes. v1 was the
# all-signed split-half layout; v2 (round 4) stores the LOW nibble
# offset-binary (+8) so the decode kernel's low operand is a single AND.
# Serialized graphs (ONNX MatMulWOQ) carry this as an attribute so stale
# packed bytes fail loudly at import instead of decoding garbage; bump it
# whenever quantize_weight's packing changes.
INT4_PACK_VERSION = 2


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class QuantizedLinear:
    """Weight-only quantized [in, out] matrix.

    qweight: int8 [in, out_p] (int8 mode) or packed int8 [in//2, out_p]
    scales:  f32/bf16 [n_groups, out_p]
    bits:    4 or 8
    group_size: contraction rows per scale group
    out_logical: logical output dim when the PHYSICAL columns are padded
        to a tile-friendly multiple (0 = unpadded). A dout like 22016 has
        no 128-multiple divisor above 512; padding to 22528 unlocks the
        1024/2048 output tiles the kernel streams fastest with
        (docs/QMM_TUNE_REPORT.json). Matmul wrappers slice the result
        back to out_features.
    """

    qweight: jax.Array
    scales: jax.Array
    bits: int
    group_size: int
    out_logical: int = 0

    def tree_flatten(self):
        return (self.qweight, self.scales), (self.bits, self.group_size,
                                             self.out_logical)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], *aux)

    @property
    def in_features(self) -> int:
        rows = self.qweight.shape[0]
        return rows * 2 if self.bits == 4 else rows

    @property
    def out_features(self) -> int:
        return self.out_logical or self.qweight.shape[-1]

    @property
    def out_physical(self) -> int:
        return self.qweight.shape[-1]

    @property
    def paired(self) -> bool:
        """True when int4 scale groups PAIR the split halves: one scale
        row covers rows [c*g,(c+1)*g) AND [half+c*g, half+(c+1)*g) —
        2*group_size weights per scale. Inferable from the scale count
        (din/2g rows instead of din/g), so the byte layout and the
        serialized form are unchanged (INT4_PACK_VERSION stays 2).
        Enables the slab kernel: ONE 2g-deep MXU dot per packed group
        (kernels/quant_matmul._group_dots_slab)."""
        return (self.bits == 4 and self.group_size > 0
                and self.scales.shape[0] * self.group_size * 2
                == self.in_features)


def quantize_weight(w, bits: int = 8, group_size: Optional[int] = None,
                    clip: str = "auto", pad_out: int = 0,
                    paired: bool = False) -> QuantizedLinear:
    """Symmetric per-group-per-channel quantization of [in, out] weight.

    clip: "none" = absmax scales (plain RTN); "mse" = per-group clip-ratio
    search minimizing round-trip MSE (a calibration-free accuracy win that
    matters at 4 bits, where absmax outliers waste half the codebook);
    "auto" = mse for int4, none for int8 (int8 RTN error is already tiny).

    paired (int4 only): one scale row covers the PAIRED split-half groups
    (rows [c*g,(c+1)*g) + [half+c*g, half+(c+1)*g), 2g weights/scale) —
    the grouping the slab kernel needs; effective group size doubles, so
    the accuracy gate (docs/PPL_GATE_V3.json) decides admissibility.
    """
    w = jnp.asarray(w)
    din, dout = w.shape
    out_logical = 0
    if pad_out and dout % pad_out:
        pad = pad_out - dout % pad_out
        w = jnp.pad(w, ((0, 0), (0, pad)))
        out_logical, dout = dout, dout + pad
    if group_size is None:
        group_size = din  # per-channel only
    while din % group_size:  # snap to a divisor (e.g. 11008-like odd dims)
        group_size //= 2
        if group_size == 0:
            group_size = din
            break
    if paired:
        assert bits == 4 and din % 2 == 0, "paired needs int4 even din"
        # the paired partition needs groups that tile each HALF; snap
        # down (e.g. din=704: half=352, group 128 -> 32). Unsnappable
        # shapes quantize non-paired (fall through below).
        while group_size >= 32 and (din // 2) % group_size:
            group_size //= 2
        if (din // 2) % group_size:
            paired = False
    if paired:
        half = din // 2
        ngh = half // group_size
        # paired view: group c = rows [c*g,(c+1)*g) + the mirrored half
        wp = jnp.stack([w[:half].reshape(ngh, group_size, dout),
                        w[half:].reshape(ngh, group_size, dout)],
                       axis=1).reshape(ngh, 2 * group_size, dout)
        qp = quantize_weight(wp.reshape(ngh * 2 * group_size, dout),
                             bits=4, group_size=2 * group_size, clip=clip)
        # un-interleave back to split-half row order, then pack
        qv = _unpack_int4(qp.qweight).reshape(ngh, 2, group_size, dout)
        q_lo = qv[:, 0].reshape(half, dout)
        q_hi = qv[:, 1].reshape(half, dout)
        lo = (q_lo.astype(jnp.int32) + 8).astype(jnp.uint8) & 0xF
        hi = (q_hi.astype(jnp.uint8) & 0xF) << 4
        packed = (lo | hi).astype(jnp.int8)
        return QuantizedLinear(packed, qp.scales, 4, group_size,
                               out_logical)
    ng = din // group_size
    wg = w.reshape(ng, group_size, dout).astype(jnp.float32)
    qmax = 127.0 if bits == 8 else 7.0
    absmax = jnp.max(jnp.abs(wg), axis=1)                 # [ng, out]
    scales = jnp.maximum(absmax / qmax, 1e-8)
    if clip == "mse" or (clip == "auto" and bits == 4):
        best_err = None
        best_scales = scales
        for ratio in (1.0, 0.95, 0.9, 0.85, 0.8, 0.75, 0.7):
            s = jnp.maximum(absmax * ratio / qmax, 1e-8)
            qq = jnp.clip(jnp.round(wg / s[:, None, :]), -qmax - 1, qmax)
            err = jnp.sum(jnp.square(qq * s[:, None, :] - wg), axis=1)
            if best_err is None:
                best_err = err
            else:
                pick = err < best_err
                best_scales = jnp.where(pick, s, best_scales)
                best_err = jnp.minimum(err, best_err)
        scales = best_scales
    q = jnp.round(wg / scales[:, None, :])
    q = jnp.clip(q, -qmax - 1, qmax).astype(jnp.int8)
    q = q.reshape(din, dout)
    if bits == 4:
        # SPLIT-HALF packing: row i packs w[i] (low nibble) with
        # w[i + din//2] (high nibble). Unpacking is then two CONTIGUOUS
        # row blocks — no sublane interleave, which Mosaic lowers to a
        # per-element shuffle ~14x slower than the matmul it feeds.
        #
        # The low nibble is stored OFFSET-BINARY (value + 8, in [0, 15])
        # so the decode-kernel's low-half operand is a single int8 AND
        # (the +8 bias folds into a per-group dot correction); the high
        # nibble stays signed so (byte & 0xF0) = 16*hi directly (the /16
        # folds into the scale row). See kernels/quant_matmul._group_dots.
        half = din // 2
        lo = (q[:half].astype(jnp.int32) + 8).astype(jnp.uint8) & 0xF
        hi = (q[half:].astype(jnp.uint8) & 0xF) << 4
        q = (lo | hi).astype(jnp.int8)
    return QuantizedLinear(q, scales.astype(jnp.float32), bits, group_size,
                           out_logical)


def _unpack_nibbles(packed: jax.Array) -> tuple:
    """[in//2, out] packed -> (lo, hi) int32 in [-8, 7]; lo = w rows
    [0, in/2), hi = w rows [in/2, in) (split-half layout; low nibble
    stored offset-binary, see quantize_weight)."""
    u = packed.astype(jnp.int32)
    lo = (u & 15) - 8
    hi = (u << 24) >> 28
    return lo, hi


def _unpack_int4(packed: jax.Array) -> jax.Array:
    """[in//2, out] packed -> [in, out] int8 in [-8, 7] (split-half)."""
    lo, hi = _unpack_nibbles(packed)
    return jnp.concatenate([lo, hi], axis=0).astype(jnp.int8)


def dequantize_weight(q: QuantizedLinear, dtype=jnp.bfloat16) -> jax.Array:
    # Dequantize directly in the target dtype: an fp32 [din, dout]
    # intermediate would cost 4 bytes/elem of HBM traffic and defeat the
    # whole point of int8 storage when XLA declines to fuse.
    w = _unpack_int4(q.qweight) if q.bits == 4 else q.qweight
    din, dout = w.shape
    ng = q.scales.shape[0]
    if q.bits == 4 and q.paired:
        # one scale row per paired split-half group: row i's group is
        # (i % half) // group_size
        half = din // 2
        wf = w.reshape(2, ng, half // ng, dout).astype(dtype)
        wf = wf * q.scales[None, :, None, :].astype(dtype)
        out = wf.reshape(din, dout)
        return out[:, :q.out_logical] if q.out_logical else out
    wf = w.reshape(ng, din // ng, dout).astype(dtype)
    wf = wf * q.scales[:, None, :].astype(dtype)
    out = wf.reshape(din, dout)
    return out[:, :q.out_logical] if q.out_logical else out


def repack_int4_rows(packed: np.ndarray, start: int, rows: int) -> np.ndarray:
    """Exact row-shard of a packed int4 qweight: unpack the split-half
    nibble layout to integer values, slice UNPACKED rows [start, start+rows),
    and re-pack the slice as its own split-half matrix (low nibble
    offset-binary, matching quantize_weight). Pure integer manipulation —
    bit-exact, no re-quantization (a dequantize->requantize round trip is
    NOT identity when a group's absmax shrinks). Used by the graph TP
    transform's row-parallel shards (parallel/graph_tp.py)."""
    packed = np.asarray(packed)
    u = packed.astype(np.int32)
    lo = (u & 15) - 8
    hi = (u << 24) >> 28
    vals = np.concatenate([lo, hi], axis=0)          # [din, dout] in [-8,7]
    assert rows % 2 == 0, "int4 shard must have even row count"
    sl = vals[start:start + rows]
    half = rows // 2
    lo2 = ((sl[:half] + 8).astype(np.uint8)) & 0xF
    hi2 = (sl[half:].astype(np.uint8) & 0xF) << 4
    return (lo2 | hi2).astype(np.int8)


def concat_qlinear(*qs: QuantizedLinear) -> QuantizedLinear:
    """Concatenate quantized matrices along the output dim (fused QKV /
    gate+up): fewer, larger kernels amortize per-call overhead. Requires
    matching bits/group_size/in_features."""
    first = qs[0]
    assert all(q.bits == first.bits and q.group_size == first.group_size
               and q.qweight.shape[0] == first.qweight.shape[0]
               and not q.out_logical for q in qs), \
        "concat requires unpadded operands with matching quantization"
    return QuantizedLinear(
        jnp.concatenate([q.qweight for q in qs], axis=1),
        jnp.concatenate([q.scales for q in qs], axis=1),
        first.bits, first.group_size)


def wo_matmul(x: jax.Array, q: QuantizedLinear, use_pallas: str = "auto"
              ) -> jax.Array:
    """x [..., in] @ quantized w -> [..., out].

    jnp path: dequantize (XLA fuses the int8->bf16 convert + scale into the
    matmul's operand stream); Pallas path streams int8 blocks HBM->VMEM and
    dequantizes in-registers (kernels/quant_matmul.py) — the bandwidth win
    (2-4x fewer HBM bytes than bf16) is why quantized serving is fast.
    """
    if use_pallas == "auto":
        use_pallas = is_tpu()
    import os
    if os.environ.get("INFINITPU_QMM_VARIANT") == "w4a8":
        # the W4A8 variant changes the MATH (per-token int8 activation
        # quantization), not just the kernel — it must apply regardless
        # of shape/platform so accuracy gates certify what the chip
        # runs; quant_matmul falls back to the w4a8 oracle off-TPU
        from infinitensor_tpu.kernels.quant_matmul import quant_matmul
        return quant_matmul(x, q)
    if use_pallas and x.shape[-1] >= 512:
        from infinitensor_tpu.kernels.quant_matmul import quant_matmul
        return quant_matmul(x, q)
    w = dequantize_weight(q, dtype=x.dtype)
    return jnp.matmul(x, w, preferred_element_type=jnp.float32).astype(x.dtype)
