"""Decompose the dequant-matmul kernel's time at the slow decode shapes
(round-4 verdict item 1: wo 464 GB/s, w_down 440-491, wqkv 540-560 vs the
664-727 the same chip streams on attention/lm_head reads).

For each shape, times kernel VARIANTS that each remove one piece of the
work, all on the same grid/block geometry, so the gap decomposes into
DMA ceiling / int4 unpack / MXU dots / scale multiplies / x re-fetch:

  stream   weight DMA + trivial reduce (per-shape DMA ceiling)
  stream0  same but with NO x operand (x re-fetch cost)
  nounpack one dot per packed group, bytes used as int8 (no shifts)
  noscale  full unpack + dots, scale multiplies skipped
  group    the shipping kernel (unpack + dots + scales)
  hi4      alt unpack: hi = u>>4; lo = ((u&15)^8)-8  (3 cheap ops vs
           2 shift pairs)
  slab     unpack a 2-group slab, ONE dot per 256 rows, scales folded
           into x columns per slab half (halves MXU call count)

Round-5 variants (decompose the fuse4 -> nounpack gap: 616-683 vs
810-1030 GB/s; the unpack is free, so what costs?):

  and2       fuse4's TWO AND+cast decodes + 2 dots + group scales but
             NO dot-bias correction -> isolates the correction cost
  i8nounpack ONE int8 dot per packed group, raw bytes as the operand,
             NO bf16 cast at all -> the int8-MXU ceiling (W4A8's roof)
  i8dot      W4A8 candidate: x quantized to int8 once per block, both
             nibble operands decoded by one AND each (still int8!),
             int8xint8->int32 MXU dots, scales applied to i32 partials
  i8slab     one int8 dot per packed group over the concatenated
             [xl|xh] x [lo;hi] slab (halves MXU calls; scale row
             blended -> perf probe only)
  gs256/512  fuse4 with an EFFECTIVE scale group of 256/512 rows
             (fewer partial-dot scale applications + corrections;
             models what a larger quant group buys before the gate
             decides its accuracy cost)

Protocol: runtime-trip-count fori chain (ONE compile per variant), K
kernel calls per trip with a scalar data dependence, two-point diff,
min-of-3, host fetch. Writes docs/QMM_EXPLORE.json.

Run: python tools/qmm_explore.py   (real TPU)
"""

import functools
import json
import os
import sys
import threading
import time

os.environ.setdefault("JAX_PLATFORMS", "axon,tpu,cpu")
_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
print = functools.partial(print, flush=True)

OUT = os.path.join(_ROOT, "docs", "QMM_EXPLORE.json")
RESULTS: dict = {}


def emit(key, data):
    RESULTS[key] = data
    print(f"# {key}: {json.dumps(data)}")
    with open(OUT, "w") as f:
        json.dump(RESULTS, f, indent=1)


def make_variant(variant, bn, group_size, rows, din, dout):
    """Build fn(x, qw, sc) -> [rows, dout] for an int4 split-half packed
    weight [din//2, dout]."""
    import jax
    import jax.numpy as jnp
    import jax.experimental.pallas as pl

    g = group_size
    half = din // 2
    ng_half = half // g

    def body(x_ref, qw_ref, sc_ref, o_ref):
        x = x_ref[:, :]
        acc = jnp.zeros((rows, bn), jnp.float32)
        if variant in ("stream", "stream0"):
            s = jnp.sum(qw_ref[:, :].astype(jnp.float32))
            s = s + jnp.sum(sc_ref[:, :].astype(jnp.float32))
            if variant == "stream":
                s = s + jnp.sum(x)
            o_ref[:, :] = jnp.full((rows, bn), s, jnp.float32
                                   ).astype(o_ref.dtype)
            return
        if variant == "nounpack":
            for c in range(ng_half):
                w = qw_ref[c * g:(c + 1) * g, :].astype(jnp.bfloat16)
                pd = jnp.dot(x[:, c * g:(c + 1) * g], w,
                             preferred_element_type=jnp.float32)
                acc = acc + pd * sc_ref[c, :].astype(jnp.float32)[None, :]
            o_ref[:, :] = acc.astype(o_ref.dtype)
            return
        if variant == "i8nounpack":
            # int8-MXU ceiling: raw packed bytes straight into an
            # int8xint8->i32 dot, one dot per packed group, scales on
            # the i32 partials. No decode, no bf16 copy of the tile.
            xq = (x * jnp.bfloat16(16.0)).astype(jnp.int8)
            for c in range(ng_half):
                pd = jax.lax.dot_general(
                    xq[:, c * g:(c + 1) * g],
                    qw_ref[c * g:(c + 1) * g, :],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                acc = acc + pd.astype(jnp.float32) \
                    * sc_ref[c, :].astype(jnp.float32)[None, :]
            o_ref[:, :] = acc.astype(o_ref.dtype)
            return
        if variant in ("i8dot", "i8slab"):
            # W4A8 candidate: quantize x once (per-block; the real
            # kernel does it per token-row outside), decode each nibble
            # with ONE int8 AND (operands stay int8 -> no bf16 cast
            # pass, no 2x VMEM copy), int8 MXU dots, scales on partials.
            xq = (x * jnp.bfloat16(16.0)).astype(jnp.int8)
            dn = (((1,), (0,)), ((), ()))
            for c in range(ng_half):
                u8 = qw_ref[c * g:(c + 1) * g, :]
                lo8 = u8 & jnp.int8(15)            # lo + 8, int8
                hi8 = u8 & jnp.int8(-16)           # 16*hi, int8
                xl8 = xq[:, c * g:(c + 1) * g]
                xh8 = xq[:, half + c * g:half + (c + 1) * g]
                if variant == "i8slab":
                    w2 = jnp.concatenate([lo8, hi8], axis=0)
                    x2 = jnp.concatenate([xl8, xh8], axis=1)
                    pd = jax.lax.dot_general(
                        x2, w2, dn, preferred_element_type=jnp.int32)
                    acc = acc + pd.astype(jnp.float32) \
                        * sc_ref[c, :].astype(jnp.float32)[None, :]
                    continue
                pd_lo = jax.lax.dot_general(
                    xl8, lo8, dn, preferred_element_type=jnp.int32)
                pd_hi = jax.lax.dot_general(
                    xh8, hi8, dn, preferred_element_type=jnp.int32)
                corr = jnp.sum(xl8.astype(jnp.int32), axis=1,
                               keepdims=True) * 8
                s_hi = sc_ref[ng_half + c, :].astype(jnp.float32) \
                    * jnp.float32(0.0625)
                acc = acc + (pd_lo - corr).astype(jnp.float32) \
                    * sc_ref[c, :].astype(jnp.float32)[None, :]
                acc = acc + pd_hi.astype(jnp.float32) * s_hi[None, :]
            o_ref[:, :] = acc.astype(o_ref.dtype)
            return
        if variant in ("gs256", "gs512"):
            # fuse4 math at an EFFECTIVE group of G rows: one scale
            # application + one correction per G instead of per g.
            G = 256 if variant == "gs256" else 512
            stride = G // g
            for c in range(half // G):
                u8 = qw_ref[c * G:(c + 1) * G, :]
                hi = (u8 & jnp.int8(-16)).astype(jnp.bfloat16)
                lo = (u8 & jnp.int8(15)).astype(jnp.bfloat16)
                xl = x[:, c * G:(c + 1) * G]
                xh = x[:, half + c * G:half + (c + 1) * G]
                pd_lo = jnp.dot(xl, lo, preferred_element_type=jnp.float32)
                pd_hi = jnp.dot(xh, hi, preferred_element_type=jnp.float32)
                corr = jnp.sum(xl.astype(jnp.float32), axis=1,
                               keepdims=True) * jnp.float32(8.0)
                s_lo = sc_ref[c * stride, :].astype(jnp.float32)
                s_hi = sc_ref[ng_half + c * stride, :].astype(
                    jnp.float32) * jnp.float32(0.0625)
                acc = acc + (pd_lo - corr) * s_lo[None, :] \
                    + pd_hi * s_hi[None, :]
            o_ref[:, :] = acc.astype(o_ref.dtype)
            return
        if variant == "dma":
            # true DMA ceiling: blocks stream in, near-zero VPU work
            o_ref[:, :] = (qw_ref[:rows, :].astype(jnp.float32)
                           + sc_ref[:1, :].astype(jnp.float32)
                           + x[:, :bn]).astype(o_ref.dtype)
            return
        for c in range(ng_half):
            if variant == "fuse4":
                # zero-wide-op decode, CURRENT packing, exact:
                #   hi: (u & 0xF0) = 16*hi as int8 -> cast -> dot; the
                #       /16 folds into the scale row (one [1,bn] mul)
                #   lo: (u & 15) ^ 8 = lo_s + 8 -> cast -> dot; the -8
                #       folds into a per-group dot-bias correction
                # int8 AND/XOR + casts fuse into the MXU operand path
                # (andonly probe: 1029 GB/s vs 500 for the i32 shifts)
                u8 = qw_ref[c * g:(c + 1) * g, :]
                hi = (u8 & jnp.int8(-16)).astype(jnp.bfloat16)  # 16*hi
                lo = ((u8 & jnp.int8(15)) ^ jnp.int8(8)
                      ).astype(jnp.bfloat16)                    # lo_s + 8
                u = None
            elif variant == "and2":
                # fuse4's exact decode ops (two int8 ANDs + two bf16
                # casts) but WITHOUT the dot-bias correction (group
                # scale math below) -> isolates the correction's cost
                u8 = qw_ref[c * g:(c + 1) * g, :]
                hi = (u8 & jnp.int8(-16)).astype(jnp.bfloat16)  # 16*hi
                lo = (u8 & jnp.int8(15)).astype(jnp.bfloat16)   # lo + 8
                u = None
            elif variant == "andonly":
                # perf probe: ONE int8 op + cast feeding each dot — does
                # a single pre-op keep nounpack's speed?
                u8 = qw_ref[c * g:(c + 1) * g, :]
                lo = (u8 & jnp.int8(15)).astype(jnp.bfloat16)
                hi = lo
                u = None
            elif variant == "mix":
                # real candidate (requires offset-binary lo repacking):
                # hi via the i32 path ONCE; lo = pf - 16*hi in bf16 (one
                # fma) + a per-group dot-bias correction for the +8 bias
                u = qw_ref[c * g:(c + 1) * g, :].astype(jnp.int32)
                hi = ((u << 24) >> 28).astype(jnp.bfloat16)
                pf = qw_ref[c * g:(c + 1) * g, :].astype(jnp.bfloat16)
                lo = pf - hi * jnp.bfloat16(16.0)   # biased lo (lo_s + 8)
                u = None
            elif variant == "nib8":
                # shift-free decode using ONLY Mosaic-supported int8 ops
                # (AND/XOR; int8 SUB and compares are rejected — probed
                # by tools/qmm_diag.py) + exact bf16 arithmetic
                u8 = qw_ref[c * g:(c + 1) * g, :]
                lo_u8 = u8 & jnp.int8(15)
                lo_uf = lo_u8.astype(jnp.bfloat16)
                lo = (lo_u8 ^ jnp.int8(8)).astype(jnp.bfloat16) \
                    - jnp.bfloat16(8.0)
                pf = u8.astype(jnp.bfloat16)
                hi = (pf - lo_uf) * jnp.bfloat16(0.0625)
                u = None
            elif variant in ("bf16up", "f32up"):
                # nibble decode in FLOAT arithmetic — no int32 widen, no
                # shifts (exact for every byte; verified exhaustively)
                ft = jnp.bfloat16 if variant == "bf16up" else jnp.float32
                pf = qw_ref[c * g:(c + 1) * g, :].astype(ft)
                hi = jnp.floor(pf * ft(1.0 / 16.0))
                lo_u = pf - hi * ft(16.0)
                lo = lo_u - ft(16.0) * (lo_u >= ft(8.0)).astype(ft)
                hi = hi.astype(jnp.bfloat16)
                lo = lo.astype(jnp.bfloat16)
                u = None
            else:
                u = qw_ref[c * g:(c + 1) * g, :].astype(jnp.int32)
            if variant == "hi4":
                hi = (u >> 4).astype(jnp.bfloat16)
                lo = (((u & 15) ^ 8) - 8).astype(jnp.bfloat16)
            elif u is not None:
                lo = ((u << 28) >> 28).astype(jnp.bfloat16)
                hi = ((u << 24) >> 28).astype(jnp.bfloat16)
            xl = x[:, c * g:(c + 1) * g]
            xh = x[:, half + c * g:half + (c + 1) * g]
            if variant == "slab":
                # ONE [rows, 2g] x [2g, bn] dot per packed group: scales
                # folded into the x columns is impossible (they vary per
                # OUTPUT channel), so slab merges the lo/hi dots instead
                w2 = jnp.concatenate([lo, hi], axis=0)       # [2g, bn]
                x2 = jnp.concatenate([xl, xh], axis=1)       # [rows, 2g]
                pd = jnp.dot(x2, w2, preferred_element_type=jnp.float32)
                # one blended scale row is WRONG numerically unless the
                # two groups share scales — slab is a perf probe for the
                # MXU-call-count hypothesis, parity not expected
                acc = acc + pd * sc_ref[c, :].astype(jnp.float32)[None, :]
                continue
            pd_lo = jnp.dot(xl, lo, preferred_element_type=jnp.float32)
            pd_hi = jnp.dot(xh, hi, preferred_element_type=jnp.float32)
            if variant == "noscale":
                acc = acc + pd_lo + pd_hi
            elif variant in ("mix", "fuse4"):
                # bias correction: dot used lo_s + 8, so subtract
                # 8 * sum(xl) per group (outer product with the scale
                # row); fuse4's hi dot carries 16*hi, so its scale row
                # is pre-multiplied by 1/16
                corr = jnp.sum(xl.astype(jnp.float32), axis=1,
                               keepdims=True) * jnp.float32(8.0)
                s_hi = sc_ref[ng_half + c, :].astype(jnp.float32)
                if variant == "fuse4":
                    s_hi = s_hi * jnp.float32(0.0625)
                acc = acc + \
                    (pd_lo - corr) * sc_ref[c, :].astype(
                        jnp.float32)[None, :] + \
                    pd_hi * s_hi[None, :]
            else:                       # group (shipping math)
                acc = acc + \
                    pd_lo * sc_ref[c, :].astype(jnp.float32)[None, :] + \
                    pd_hi * sc_ref[ng_half + c, :].astype(
                        jnp.float32)[None, :]
        o_ref[:, :] = acc.astype(o_ref.dtype)

    in_specs = [
        pl.BlockSpec((rows, din), lambda j: (0, 0)),
        pl.BlockSpec((half, bn), lambda j: (0, j)),
        pl.BlockSpec((2 * ng_half, bn), lambda j: (0, j)),
    ]
    if variant == "stream0":
        in_specs[0] = pl.BlockSpec((rows, 128), lambda j: (0, 0))

    interp = os.environ.get("QMM_INTERP") == "1"

    def call(x, qw, sc):
        xin = x[:, :128] if variant == "stream0" else x
        return pl.pallas_call(
            body,
            grid=(dout // bn,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((rows, bn), lambda j: (0, j)),
            out_shape=jax.ShapeDtypeStruct((rows, dout), jnp.bfloat16),
            interpret=interp,
        )(xin, qw, sc)

    return call


def main():
    def heartbeat():
        n = 0
        while True:
            time.sleep(120)
            n += 1
            print(f"# heartbeat {n}")

    import jax
    import jax.numpy as jnp
    import numpy as np

    dev = jax.devices()[0]
    np.asarray(jnp.zeros((1,)))
    print(f"# device ready: {getattr(dev, 'device_kind', dev.platform)}")
    threading.Thread(target=heartbeat, daemon=True).start()

    # all five decode-path shapes (physical/padded douts, tuned bns)
    shapes = {
        "wo": (4096, 4096, (512, 1024)),
        "w_down": (11008, 4096, (512,)),
        "wqkv": (4096, 12288, (1536,)),
        "w_gateup": (4096, 22528, (1408,)),
        "lm_head": (4096, 32000, (1280,)),
    }
    if os.environ.get("QMM_SMALL"):
        shapes = {"small": (512, 512, (128,))}
    only = os.environ.get("QMM_SHAPES")
    if only:
        shapes = {k: v for k, v in shapes.items() if k in only.split(",")}
    variants = os.environ.get(
        "QMM_VARIANTS",
        "nounpack,i8nounpack,and2,fuse4,group,i8dot,i8slab,gs256,"
        "gs512").split(",")
    rows, g = 8, 128
    # K=256 calls/trip: wo at ~15 us/pass needs ~4 ms of signal per trip
    # to clear tunnel jitter (round-3 lesson: <1 ms/pass sweeps are noise)
    K = int(os.environ.get("QMM_K", "256"))     # kernel calls per trip
    N_LO, N_HI = 1, int(os.environ.get("QMM_NHI", "9"))

    for name, (din, dout, bns) in shapes.items():
        key = jax.random.PRNGKey(1)
        qw = jax.random.randint(key, (din // 2, dout), -127, 127,
                                jnp.int8)
        sc = jax.random.uniform(key, (din // g, dout), jnp.float32,
                                0.001, 0.02).astype(jnp.bfloat16)
        x = jax.random.normal(key, (rows, din), jnp.bfloat16)
        nbytes = int(qw.size) + int(sc.size) * 2
        for bn in bns:
            if dout % bn:
                continue
            for variant in variants:
                if variant in ("gs256", "gs512") and \
                        (din // 2) % (256 if variant == "gs256"
                                      else 512):
                    emit(f"{name}:bn{bn}:{variant}",
                         {"skip": "half not divisible by group"})
                    continue
                fn = make_variant(variant, bn, g, rows, din, dout)

                def chained(s, n, x, qw, sc):
                    def trip(i, a):
                        acc = a
                        for _ in range(K):
                            out = fn(x + acc.astype(jnp.bfloat16), qw, sc)
                            acc = jnp.sum(out[:1, :8]).astype(
                                jnp.float32) * 1e-30
                        return acc
                    return jax.lax.fori_loop(0, n, trip, s)

                f = jax.jit(chained)
                try:
                    np.asarray(f(jnp.float32(0), jnp.int32(1), x, qw, sc))
                except Exception as e:  # noqa: BLE001
                    emit(f"{name}:bn{bn}:{variant}",
                         {"error": repr(e)[:1500]})
                    continue

                def run_n(n):
                    best = float("inf")
                    for _ in range(3):
                        t0 = time.perf_counter()
                        np.asarray(f(jnp.float32(1e-30), jnp.int32(n),
                                     x, qw, sc))
                        best = min(best, time.perf_counter() - t0)
                    return best

                dt = (run_n(N_HI) - run_n(N_LO)) / ((N_HI - N_LO) * K)
                emit(f"{name}:bn{bn}:{variant}",
                     {"us": round(dt * 1e6, 2),
                      "gbps": round(nbytes / dt / 1e9, 1)})

    print(json.dumps({"metric": "qmm explore", "n": len(RESULTS)}))


if __name__ == "__main__":
    if (os.environ.get("BENCH_WATCHDOG", "1") == "1"
            and not os.environ.get("BENCH_CHILD")):
        from infinitensor_tpu.utils.watchdog import babysit
        sys.exit(babysit(
            [sys.executable, os.path.abspath(__file__)],
            quiet_s=600.0, gap_s=420.0, attempts=2,
            env=dict(os.environ, BENCH_CHILD="1")))
    main()
